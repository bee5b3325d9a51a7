"""Unit tests for ops/blocks.py parameterisations and primitives, with
golden-value checks against torch (CPU) where the reference defines the
exact math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from genesis_tpu.ops import blocks as B


def test_to_sigma_matches_reference():
    x = np.linspace(-5, 5, 41).astype(np.float32)
    ours = np.asarray(B.to_sigma(jnp.asarray(x)))
    theirs = (F.softplus(torch.tensor(x) + 0.5) + 1e-8).numpy()
    # jax and torch use different softplus approximations -> ~1e-4 rel
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(B.to_var(jnp.asarray(x))),
                               theirs ** 2, rtol=2e-3)


def test_to_prior_sigma_matches_reference():
    x = np.linspace(-8, 8, 33).astype(np.float32)
    ours = np.asarray(B.to_prior_sigma(jnp.asarray(x)))
    theirs = (torch.sigmoid(torch.tensor(x) + 4.0) + 1e-4).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
    assert ours.min() >= 1e-4 and ours.max() <= 1 + 1e-4


def test_clamp_preserve_gradients():
    def f(x):
        return jnp.sum(B.clamp_preserve_gradients(x, 0.2, 0.8) ** 2)
    x = jnp.asarray([0.1, 0.5, 0.9])
    g = jax.grad(f)(x)
    # Forward clamps
    y = B.clamp_preserve_gradients(x, 0.2, 0.8)
    np.testing.assert_allclose(np.asarray(y), [0.2, 0.5, 0.8], rtol=1e-6)
    # Backward is the gradient of the clamped value wrt the raw input
    # (straight-through): d/dx (clamp(x))^2 = 2*clamp(x)
    np.testing.assert_allclose(np.asarray(g), [0.4, 1.0, 1.6], rtol=1e-6)


def test_pixel_coords_matches_torch_meshgrid():
    n = 8
    ours = np.asarray(B.pixel_coords(n))[0]  # [H, W, 2]
    g1, g2 = torch.meshgrid(torch.linspace(-1, 1, n),
                            torch.linspace(-1, 1, n))
    np.testing.assert_allclose(ours[..., 0], g1.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours[..., 1], g2.numpy(), atol=1e-6)


def test_nearest_resampling_matches_torch():
    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    xt = torch.tensor(np.moveaxis(x, -1, 1))
    down_t = F.interpolate(xt, scale_factor=0.5, mode="nearest")
    up_t = F.interpolate(xt, scale_factor=2.0, mode="nearest")
    down_j = np.moveaxis(np.asarray(B.down2_nearest(jnp.asarray(x))), -1, 1)
    up_j = np.moveaxis(np.asarray(B.up2_nearest(jnp.asarray(x))), -1, 1)
    np.testing.assert_allclose(down_j, down_t.numpy(), atol=1e-7)
    np.testing.assert_allclose(up_j, up_t.numpy(), atol=1e-7)


def test_distances():
    a = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0], [3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(B.squared_distance(a, b)), [4.0, 25.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(B.euclidian_distance(a, b)), [2.0, 5.0], rtol=1e-6)


def test_semiconv_initial_output_is_coords(rng_key):
    """ScalarGate inits to 0, so SemiConv output == fixed uv field."""
    m = B.SemiConv(nout=8, img_size=8)
    x = jnp.ones((2, 8, 8, 4))
    v = m.init(rng_key, x)
    out, delta = m.apply(v, x)
    coords = np.asarray(B.pixel_coords(8))[0]
    np.testing.assert_allclose(np.asarray(out[0, ..., :6]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, ..., 6:]), coords,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-6)


def test_broadcast_layer_vector(rng_key):
    m = B.BroadcastLayer(dim=5)
    z = jnp.arange(6.0).reshape(2, 3)
    v = m.init(rng_key, z)
    out = m.apply(v, z)
    assert out.shape == (2, 5, 5, 5)
    # first 3 channels are the tiled latent
    np.testing.assert_allclose(np.asarray(out[1, 2, 3, :3]), [3.0, 4.0, 5.0])
