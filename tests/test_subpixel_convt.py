"""Sub-pixel ConvTranspose (ops/blocks.py) must be bit-compatible with
flax nn.ConvTranspose: identical param tree and (within float tolerance)
identical outputs for every configuration the models use."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from genesis_tpu.ops import blocks as B


CONFIGS = [
    # (kernel, stride, padding, in_hw, cin, cout) — model call sites:
    (5, 2, "SAME", 8, 16, 24),     # V2 decoder / gated deconv upsample
    (5, 2, "SAME", 7, 8, 8),       # odd spatial size
    (5, 1, "SAME", 8, 8, 12),      # stride-1 gated deconv
    (16, 1, "VALID", 1, 8, 16),    # sylvester kz seed upsample (1x1->16x16)
    (8, 1, "VALID", 1, 4, 8),      # kz=8 variant (img_size 32)
    (3, 2, "SAME", 6, 4, 4),       # even-kernel-phase coverage
    (4, 2, "SAME", 6, 4, 4),
    (2, 2, "SAME", 5, 3, 7),       # k == s
    (3, 3, "SAME", 5, 4, 4),       # s > smallest phase tap count
]


@pytest.mark.parametrize("k,s,pad,hw,cin,cout", CONFIGS)
def test_matches_flax_conv_transpose(k, s, pad, hw, cin, cout):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, hw, hw, cin).astype(np.float32))

    ours = B.ConvTranspose(cout, (k, k), strides=(s, s), padding=pad)
    ref = nn.ConvTranspose(cout, (k, k), strides=(s, s), padding=pad,
                           kernel_init=B.torch_init,
                           bias_init=B.zeros_init)
    v_ours = ours.init(jax.random.PRNGKey(3), x)
    v_ref = ref.init(jax.random.PRNGKey(3), x)

    # Same param tree: names, shapes, and (same seed) same values.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), v_ours, v_ref)

    y_ours = ours.apply(v_ours, x)
    y_ref = ref.apply(v_ref, x)
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_flax():
    """Custom path must be transparent to autodiff."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 6).astype(np.float32))
    ours = B.ConvTranspose(10, (5, 5), strides=(2, 2), padding="SAME")
    ref = nn.ConvTranspose(10, (5, 5), strides=(2, 2), padding="SAME",
                           kernel_init=B.torch_init,
                           bias_init=B.zeros_init)
    v = ours.init(jax.random.PRNGKey(0), x)

    g_ours = jax.grad(lambda v: jnp.sum(ours.apply(v, x) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum(ref.apply(v, x) ** 2))(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-4),
        g_ours, g_ref)


def test_env_fallback_matches(monkeypatch):
    """GENESIS_TPU_NO_SUBPIXEL routes to the stock dilated-conv path with
    identical results (the A/B switch for benchmarking)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
    mod = B.ConvTranspose(6, (5, 5), strides=(2, 2), padding="SAME")
    v = mod.init(jax.random.PRNGKey(0), x)
    y_fast = mod.apply(v, x)
    monkeypatch.setenv("GENESIS_TPU_NO_SUBPIXEL", "1")
    y_slow = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                               atol=1e-5, rtol=1e-5)
