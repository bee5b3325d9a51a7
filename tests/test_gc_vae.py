"""Gated-conv VAE core: stride tables and shapes across input sizes
(reference VAE.py:56-69), norm options, and gated-conv math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.ops.gc_vae import (GatedConv, GatedConvVAE,
                                    _stride_table)


def test_stride_table():
    assert _stride_table(32) == (8, [1, 2, 1, 2, 1])
    assert _stride_table(64) == (16, [1, 2, 1, 2, 1])
    assert _stride_table(128) == (16, [2, 2, 2, 1, 1])
    assert _stride_table(256) == (16, [2, 2, 2, 2, 1])
    with pytest.raises(ValueError):
        _stride_table(100)


@pytest.mark.parametrize("img", [32, 64, 128])
def test_vae_shapes_across_sizes(img):
    key = jax.random.PRNGKey(0)
    vae = GatedConvVAE(z_size=12, img_size=img, nout=2)
    x = jnp.ones((2, img, img, 4))
    v = jax.jit(lambda: vae.init({"params": key, "sample": key},
                                 x, True))()
    (xm, stats), = [jax.jit(
        lambda v, k: vae.apply(v, x, True, rngs={"sample": k}))(
        v, jax.random.PRNGKey(1))]
    assert xm.shape == (2, img, img, 2)
    assert stats["z"].shape == (2, 12)
    assert stats["mu"].shape == (2, 12)


def test_gated_conv_math(rng_key):
    """out = h * sigmoid(g) where conv output splits channelwise."""
    gc = GatedConv(nout=4, kernel=1, stride=1, padding=0)
    x = jnp.ones((1, 2, 2, 3))
    v = gc.init(rng_key, x)
    out = gc.apply(v, x)
    kernel = v["params"]["Conv_0"]["kernel"]  # [1,1,3,8]
    raw = jnp.einsum("bhwc,ijco->bhwo", x, kernel)
    h, g = jnp.split(raw, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(h * jax.nn.sigmoid(g)),
                               rtol=1e-5)


def test_gated_conv_norms(rng_key):
    for norm in ("bn", "in", None):
        gc = GatedConv(nout=4, kernel=3, stride=1, padding=1,
                       h_norm=norm, g_norm=norm)
        x = jnp.ones((2, 8, 8, 3))
        if norm == "bn":
            v = gc.init(rng_key, x, True)
            out, mut = gc.apply(v, x, True, mutable=["batch_stats"])
            assert "batch_stats" in v
        else:
            v = gc.init(rng_key, x)
            out = gc.apply(v, x)
        assert out.shape == (2, 8, 8, 4)
