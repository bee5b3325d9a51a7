"""Tests for the stick-breaking attention processes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.ops.attention import (InstanceColouringSBP, LatentSBP,
                                       SimpleSBP, sbp_rollout, LOG_ZERO)
from genesis_tpu.ops.gc_vae import GatedConvVAE
from genesis_tpu.ops.unet import UNet


def test_sbp_rollout_matches_serial_recursion():
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(4, 2, 5, 5, 1).astype(np.float32))
    log_m, log_s = sbp_rollout(a)
    # Serial reference recursion (attention.py:37-50)
    s = jnp.zeros_like(a[0])
    for k in range(4):
        m_k = s + jax.nn.log_sigmoid(a[k])
        np.testing.assert_allclose(np.asarray(log_m[k]), np.asarray(m_k),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(log_s[k]), np.asarray(s),
                                   rtol=1e-5, atol=1e-6)
        s = s + jax.nn.log_sigmoid(-a[k])
    np.testing.assert_allclose(np.asarray(log_m[4]), np.asarray(s),
                               rtol=1e-5)
    # Masks sum to one (reference tolerance 1e-3, misc.py:258-270)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_m).sum(0)), 1.0, atol=1e-3)


@pytest.fixture(scope="module")
def ic_sbp():
    key = jax.random.PRNGKey(0)
    m = InstanceColouringSBP(img_size=16, K_steps=5, feat_dim=8)
    feat = jax.random.normal(key, (3, 16, 16, 8))
    v = m.init({"params": key, "sample": key}, feat, 4)
    return m, v, feat


def test_icsbp_masks_normalised(ic_sbp):
    m, v, feat = ic_sbp
    log_m, log_s, stats = m.apply(
        v, feat, 4, rngs={"sample": jax.random.PRNGKey(7)})
    assert log_m.shape == (5, 3, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_m).sum(0)), 1.0, atol=1e-3)
    assert stats["seeds"].shape == (4, 3, 8)


def test_icsbp_dynamic_k_masks_normalised_and_padded(ic_sbp):
    m, v, feat = ic_sbp
    # Raise the threshold so breaking is very likely
    m_dyn = InstanceColouringSBP(img_size=16, K_steps=5, feat_dim=8,
                                 dynamic_K_threshold=100.0)
    log_m, _, _ = m_dyn.apply(
        v, feat, 4, dynamic_K=True, rngs={"sample": jax.random.PRNGKey(7)})
    total = np.asarray(jnp.exp(log_m).sum(0))
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
    # With threshold 100 > 16*16 = 256 pixel mass possible; at least the
    # trailing slots of some element should be padded out once broken
    masses = np.asarray(jnp.exp(log_m).sum((2, 3, 4)))  # [K, B]
    below = masses < 1e-6
    # once a slot is padded, all later slots are padded too
    for b in range(below.shape[1]):
        col = below[:, b]
        if col.any():
            first = int(np.argmax(col))
            assert col[first:].all()


def test_icsbp_seed_selection_is_batched(ic_sbp):
    """Seeds must equal the colour at the argmax(rand*scope) pixel; step 0
    scope is all-ones so argmax is over rand alone -> identical across
    kernel settings."""
    m, v, feat = ic_sbp
    _, _, stats = m.apply(v, feat, 1,
                          rngs={"sample": jax.random.PRNGKey(3)})
    colour = np.asarray(stats["colour"])       # [B,16,16,8]
    seeds = np.asarray(stats["seeds"])[0]      # [B,8]
    # Each seed must be an actual pixel of the colour field
    for b in range(colour.shape[0]):
        flat = colour[b].reshape(-1, 8)
        dists = np.abs(flat - seeds[b]).sum(-1)
        assert dists.min() < 1e-6


def test_simple_sbp_with_unet(rng_key):
    core = UNet(num_blocks=4, img_size=16, filter_start=8, in_chnls=4,
                out_chnls=1, norm="in")
    sbp = SimpleSBP(core=core)
    x = jax.random.uniform(rng_key, (2, 16, 16, 3))
    v = jax.jit(lambda: sbp.init(rng_key, x, 3))()
    log_m, log_s, _ = jax.jit(lambda v: sbp.apply(v, x, 3))(v)
    assert log_m.shape == (4, 2, 16, 16, 1)
    assert log_s.shape == (4, 2, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_m).sum(0)), 1.0, atol=1e-3)


def test_latent_sbp(rng_key):
    core = GatedConvVAE(z_size=16, img_size=32, nout=1)
    sbp = LatentSBP(core=core)
    x = jax.random.uniform(rng_key, (2, 32, 32, 3))
    rngs = {"params": rng_key, "sample": jax.random.PRNGKey(1)}
    v = jax.jit(lambda: sbp.init(rngs, x, 4))()
    log_m, log_s, stats = jax.jit(
        lambda v, k: sbp.apply(v, x, 4, rngs={"sample": k}))(
            v, jax.random.PRNGKey(2))
    assert log_m.shape == (5, 2, 32, 32, 1)
    assert stats["z_k"].shape == (4, 2, 16)
    assert stats["mu_k"].shape == (4, 2, 16)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_m).sum(0)), 1.0, atol=1e-3)
    # masks_from_zm_k decode path
    zm = stats["z_k"]
    lm2, ls2, other = jax.jit(
        lambda v, z: sbp.apply(v, z, method=sbp.masks_from_zm_k))(v, zm)
    assert lm2.shape == (5, 2, 32, 32, 1)
    assert other.shape[-1] == 0
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lm2).sum(0)), 1.0, atol=1e-3)
