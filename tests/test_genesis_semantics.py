"""Semantics tests for GENESIS-specific constructions: the K+1 -> K mask
correction and the autoregressive prior shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from genesis_tpu.ops.attention import sbp_rollout
from genesis_tpu.ops.losses import AutoregPrior


def test_mask_correction_semantics():
    """Genesis runs K attention steps -> K+1 masks, then drops the last
    and replaces slot K-1 with its scope (reference genesis_config.py:
    167-171). The corrected stack must (a) sum to one and (b) equal
    [m_0..m_{K-2}, s_{K-1}]."""
    rs = np.random.RandomState(0)
    K = 4
    a = jnp.asarray(rs.randn(K, 2, 6, 6, 1).astype(np.float32))
    log_m, log_s = sbp_rollout(a)           # K+1 masks, K+1 scopes
    corrected = jnp.concatenate([log_m[:K - 1], log_s[K - 1:K]], axis=0)
    assert corrected.shape[0] == K
    np.testing.assert_allclose(
        np.asarray(jnp.exp(corrected).sum(0)), 1.0, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(corrected[:K - 1]),
                                  np.asarray(log_m[:K - 1]))
    np.testing.assert_array_equal(np.asarray(corrected[K - 1]),
                                  np.asarray(log_s[K - 1]))


def test_autoreg_prior_shapes_and_rollout():
    key = jax.random.PRNGKey(0)
    prior = AutoregPrior(ldim=6, hidden=16)
    z_seq = jax.random.normal(key, (3, 2, 6))
    v = prior.init(key, z_seq, method=prior.prior_params)
    mu, sigma = prior.apply(v, z_seq, method=prior.prior_params)
    assert mu.shape == (3, 2, 6) and sigma.shape == (3, 2, 6)
    # tanh-bounded means, sigmoid-bounded sigmas (to_prior_sigma)
    assert float(jnp.abs(mu).max()) <= 1.0
    assert 1e-4 <= float(sigma.min()) and float(sigma.max()) <= 1 + 1e-4
    z = prior.apply(v, jax.random.PRNGKey(1), 2, 5,
                    method=prior.rollout)
    assert z.shape == (5, 2, 6)
    assert np.isfinite(np.asarray(z)).all()
