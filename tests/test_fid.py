"""FID pipeline tests (offline: random-feature extractor; the Inception
port is shape-checked with random init)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.eval import fid as F


def test_frechet_distance_identity():
    rs = np.random.RandomState(0)
    mu = rs.randn(8)
    A = rs.randn(8, 8)
    sigma = A @ A.T + np.eye(8)
    assert abs(F.frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_known_value():
    # For isotropic Gaussians: d^2 = |mu1-mu2|^2 + (sqrt(s1)-sqrt(s2))^2*D
    D = 4
    mu1, mu2 = np.zeros(D), np.ones(D)
    s1, s2 = 2.0 * np.eye(D), 0.5 * np.eye(D)
    expected = D * 1.0 + D * (np.sqrt(2.0) - np.sqrt(0.5)) ** 2
    got = F.frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_random_extractor_pipeline():
    ext = F.RandomConvExtractor(seed=0)
    rs = np.random.RandomState(1)
    real = [rs.rand(8, 32, 32, 3).astype(np.float32) for _ in range(3)]
    fake = [np.clip(b + 0.3 * rs.randn(*b.shape).astype(np.float32), 0, 1)
            for b in real]
    mu_r, s_r = F.compute_statistics(iter(real), ext)
    mu_f, s_f = F.compute_statistics(iter(fake), ext)
    d_self = F.frechet_distance(mu_r, s_r, mu_r, s_r)
    d_cross = F.frechet_distance(mu_r, s_r, mu_f, s_f)
    assert d_cross > d_self
    assert mu_r.shape == (ext.feat_dim,)
    # Deterministic across instances
    ext2 = F.RandomConvExtractor(seed=0)
    mu_r2, _ = F.compute_statistics(iter(real), ext2)
    np.testing.assert_allclose(mu_r, mu_r2, rtol=1e-5)


def test_max_images_cap():
    ext = F.RandomConvExtractor(seed=0)
    rs = np.random.RandomState(1)
    batches = [rs.rand(8, 16, 16, 3).astype(np.float32) for _ in range(4)]
    feats_mu, _ = F.compute_statistics(iter(batches), ext, max_images=20)
    assert feats_mu.shape == (ext.feat_dim,)


@pytest.mark.slow
def test_inception_architecture_shapes():
    """The FID-Inception port produces 2048-d pool3 features."""
    from genesis_tpu.eval.inception import InceptionV3FID
    model = InceptionV3FID()
    x = jnp.zeros((2, 75, 75, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (2, 2048)
