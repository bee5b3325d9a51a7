"""Pallas fused IC-SBP vs the pure-JAX rollout: forward + gradient parity
(runs in interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.ops.pallas import ic_sbp as icp


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    B, H, W, D = 3, 16, 16, 8
    colour = jax.random.normal(k1, (B, H, W, D))
    rand = jax.random.uniform(k2, (B, H, W))
    log_sigma = jnp.asarray(-1.2)
    return colour, rand, log_sigma


@pytest.mark.parametrize("kernel", ["gaussian", "laplacian",
                                    "epanechnikov"])
def test_forward_parity(inputs, kernel):
    colour, rand, log_sigma = inputs
    steps = 4
    lm_p, ls_p, seeds_p = icp.ic_sbp_rollout(colour, rand, log_sigma,
                                             steps, kernel)
    lm_j, ls_j, seeds_j = icp.jax_rollout(colour, rand, log_sigma,
                                          steps, kernel)
    np.testing.assert_allclose(np.asarray(lm_p), np.asarray(lm_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls_p), np.asarray(ls_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seeds_p), np.asarray(seeds_j),
                               rtol=1e-6)
    # Masks sum to one
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lm_p).sum(0)), 1.0, atol=1e-3)


def test_gradient_parity(inputs):
    colour, rand, log_sigma = inputs
    steps = 3

    def loss_pallas(colour, log_sigma):
        lm, ls, seeds = icp.ic_sbp_rollout(colour, rand, log_sigma,
                                           steps, "gaussian")
        return (jnp.sum(jnp.exp(lm[0]) * 1.3) + jnp.sum(ls[-1] * 0.2)
                + jnp.sum(seeds ** 2))

    def loss_jax(colour, log_sigma):
        lm, ls, seeds = icp.jax_rollout(colour, rand, log_sigma,
                                        steps, "gaussian")
        return (jnp.sum(jnp.exp(lm[0]) * 1.3) + jnp.sum(ls[-1] * 0.2)
                + jnp.sum(seeds ** 2))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(colour, log_sigma)
    gj = jax.grad(loss_jax, argnums=(0, 1))(colour, log_sigma)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gj[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(gp[1]), float(gj[1]), rtol=1e-4)


def test_supported_predicate():
    assert icp.supported(64)     # fully-resident kernel
    assert icp.supported(128)    # step-grid streaming kernel
    # 256px exceeds even the streamed-layout VMEM budget
    assert not icp.supported(256)
    assert not icp.supported(35)  # tetrominoes 35x35 -> fallback path


def test_streamed_kernel_parity_128px():
    """The step-grid (streaming) layout used above 64px must match the
    pure-JAX rollout — covers the scratch-carried scope across the step
    grid and the per-step HBM row streaming."""
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    B, H, W, D = 8, 128, 128, 8
    colour = jax.random.normal(k1, (B, H, W, D))
    rand = jax.random.uniform(k2, (B, H, W))
    log_sigma = jnp.asarray(-1.0)
    steps = 3
    # Dispatch check: this config must route to the streamed layout.
    P = H * W
    assert icp._resident_bytes(8, P, D, steps) > icp._VMEM_BUDGET
    assert icp._streamed_bytes(8, P, D) <= icp._VMEM_BUDGET
    lm_p, ls_p, seeds_p = icp.ic_sbp_rollout(colour, rand, log_sigma,
                                             steps, "gaussian")
    lm_j, ls_j, seeds_j = icp.jax_rollout(colour, rand, log_sigma,
                                          steps, "gaussian")
    np.testing.assert_allclose(np.asarray(lm_p), np.asarray(lm_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls_p), np.asarray(ls_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seeds_p), np.asarray(seeds_j),
                               rtol=1e-6)
