"""Fused GroupNorm+ReLU(+1x1 head) Pallas kernels vs stock math:
forward + full gradient parity (interpret mode on CPU; compiled on
TPU), plus the model-level guarantee that the GENESIS-V2 decoder is
bit-compatible whichever path engages."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.ops.pallas import gn_relu as gnr
from genesis_tpu.ops import blocks as B


@pytest.fixture(scope="module")
def inputs():
    rs = np.random.RandomState(0)
    N, H, W, C, F = 6, 8, 8, 16, 4
    x = jnp.asarray(rs.randn(N, H, W, C).astype(np.float32))
    scale = jnp.asarray(rs.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)
    w = jnp.asarray(rs.randn(C, F).astype(np.float32) * 0.2)
    hb = jnp.asarray(rs.randn(F).astype(np.float32) * 0.1)
    return x, scale, bias, w, hb


def _stock(x, scale, bias, groups=8, eps=1e-5):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.relu(y)


def _stock_head(x, scale, bias, w, hb):
    return jnp.einsum("nhwc,cf->nhwf", _stock(x, scale, bias), w) + hb


def test_gn_relu_forward_parity(inputs):
    x, scale, bias, _, _ = inputs
    y_ref = _stock(x, scale, bias)
    y = gnr.gn_relu(x, scale, bias, 8, 1e-5, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_gn_relu_gradient_parity(inputs):
    x, scale, bias, _, _ = inputs
    co = jnp.asarray(np.random.RandomState(1)
                     .randn(*x.shape).astype(np.float32))

    def l_ref(x, s, b):
        return jnp.sum(_stock(x, s, b) * co)

    def l_fused(x, s, b):
        return jnp.sum(gnr.gn_relu(x, s, b, 8, 1e-5, None) * co)

    g_ref = jax.grad(l_ref, argnums=(0, 1, 2))(x, scale, bias)
    g_fused = jax.grad(l_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_gn_relu_head_forward_and_grads(inputs):
    x, scale, bias, w, hb = inputs
    o_ref = _stock_head(x, scale, bias, w, hb)
    o = gnr.gn_relu_head(x, scale, bias, w, hb, 8, 1e-5)
    assert o.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)

    co = jnp.asarray(np.random.RandomState(2)
                     .randn(*o_ref.shape).astype(np.float32))

    def l_ref(*a):
        return jnp.sum(_stock_head(*a) * co)

    def l_fused(x, s, b, w, hb):
        return jnp.sum(gnr.gn_relu_head(x, s, b, w, hb, 8, 1e-5) * co)

    g_ref = jax.grad(l_ref, argnums=(0, 1, 2, 3, 4))(
        x, scale, bias, w, hb)
    g_fused = jax.grad(l_fused, argnums=(0, 1, 2, 3, 4))(
        x, scale, bias, w, hb)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_in_out(inputs):
    """The decoder feeds bf16 activations; out dtype and tolerance."""
    x, scale, bias, _, _ = inputs
    xb = x.astype(jnp.bfloat16)
    y = gnr.gn_relu(xb, scale, bias, 8, 1e-5, None)
    assert y.dtype == jnp.bfloat16
    y_ref = _stock(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref), rtol=0.1, atol=0.05)


def test_gnrelu_module_matches_groupnorm(inputs):
    """blocks.GNReLU param tree + stock-branch math == nn.GroupNorm."""
    x, _, _, _, _ = inputs
    C = x.shape[-1]
    mod = B.GNReLU(channels=C, groups=8, use_pallas=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"scale", "bias"}
    assert v["params"]["scale"].shape == (C,)
    rs = np.random.RandomState(3)
    v2 = {"params": {
        "scale": jnp.asarray(rs.rand(C).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rs.randn(C).astype(np.float32))}}
    y = mod.apply(v2, x)
    y_ref = _stock(x, v2["params"]["scale"], v2["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_predicate():
    assert gnr.supported(64, 64, 64, 8)          # decoder last @64px
    assert gnr.supported(8, 8, 64, 8)            # decoder first stage
    assert not gnr.supported(128, 128, 64, 8)    # 128px last: VMEM gate
    assert not gnr.supported(64, 64, 60, 8)      # channels % groups


def test_instance_norm_parity(inputs):
    """groups == C (instance norm, ConvINReLU's case) takes the
    identity-fold fast path; parity vs flax group_size=1."""
    x, _, _, _, _ = inputs
    C = x.shape[-1]
    rs = np.random.RandomState(4)
    scale = jnp.asarray(rs.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)
    gn = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5)
    y_ref = nn.relu(gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x))
    y = gnr.gn_relu(x, scale, bias, C, 1e-5, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    co = jnp.asarray(rs.randn(*x.shape).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(nn.relu(gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x)) * co))(x)
    g = jax.grad(lambda x: jnp.sum(
        gnr.gn_relu(x, scale, bias, C, 1e-5, None) * co))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("block_cls", [B.ConvGNReLU, B.ConvINReLU])
def test_conv_norm_blocks_param_path_and_parity(inputs, block_cls):
    """use_pallas preserves the nn.GroupNorm param path (GroupNorm_0/
    scale|bias) so checkpoints interchange, and the stock branch is
    numerically unchanged."""
    x, _, _, _, _ = inputs
    stock = block_cls(nout=16, kernel=3, stride=1, padding=1)
    fused = block_cls(nout=16, kernel=3, stride=1, padding=1,
                      use_pallas=True)
    v = stock.init(jax.random.PRNGKey(0), x)
    assert "GroupNorm_0" in v["params"]
    assert set(v["params"]["GroupNorm_0"].keys()) == {"scale", "bias"}
    y_stock = stock.apply(v, x)
    # On CPU fused_ok is False (TPU-only gate) -> same stock math; the
    # param trees must be interchangeable either way.
    y_fused = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_stock),
                               rtol=1e-6, atol=1e-6)
