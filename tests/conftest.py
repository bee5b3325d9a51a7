"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

Multi-device tests run on CPU via XLA's host-platform device-count override
(the standard way to test `jax.sharding` code without TPU pods).
"""

import os

# Overwrite (not setdefault): the container environment pins
# JAX_PLATFORMS=axon, which would route tests through the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container sitecustomize imports jax at interpreter start (before this
# conftest), so the JAX_PLATFORMS env override alone is not enough — update
# the live config too, before any backend initialises.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy model compiles dominate test time
# on CPU; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/genesis_tpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
