"""Process-level JAX configuration for all CLIs.

Enables the persistent XLA compilation cache (first compile of the bigger
models is 20-40s on TPU and minutes on CPU; subsequent runs hit the disk
cache) and exposes a debug-nans switch (the TPU-side equivalent of the
reference's numerical sanitisation, SURVEY.md section 5).
"""

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/genesis_tpu/xla_cache")


def setup_jax(compilation_cache: bool = True,
              cache_dir: str = _DEFAULT_CACHE,
              debug_nans: bool = False,
              platform: str = None) -> None:
    import jax

    if platform is None:
        # The container's sitecustomize registers the axon TPU plugin at
        # interpreter start and the env default is JAX_PLATFORMS=axon; a
        # user-exported JAX_PLATFORMS=cpu is NOT picked up by the live
        # config on its own (the plugin registration wins), so honour it
        # explicitly here — otherwise "CPU" CLI runs silently go over
        # the TPU tunnel.
        platform = os.environ.get("JAX_PLATFORMS") or None
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if compilation_cache:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
