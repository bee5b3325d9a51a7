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


def test_frechet_distance_singular_product(capfd):
    """Near-singular covariance products take the reference's eps-offset
    branch (fid_score.py:175-182) and must not print scipy's
    'Matrix is singular' diagnostic (disp=False parity), while agreeing
    with the reference implementation on the same inputs."""
    D = 6
    rs = np.random.RandomState(3)
    # Rank-1 covariances make sigma1 @ sigma2 singular.
    v1, v2 = rs.randn(D, 1), rs.randn(D, 1)
    s1, s2 = v1 @ v1.T, v2 @ v2.T
    mu1, mu2 = rs.randn(D), rs.randn(D)
    got = F.frechet_distance(mu1, s1, mu2, s2)
    out = capfd.readouterr()
    assert "Matrix is singular" not in out.out + out.err
    assert np.isfinite(got)
    # Reference oracle on the identical inputs.
    pytest.importorskip("torch")
    ref_fid = _import_ref_fid()
    want = ref_fid.calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def _import_ref_fid():
    """Import the reference fid_score module, stubbing torchvision
    (absent in this env; only needed at model-instantiation time)."""
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        class _Blk(torch.nn.Module):
            # Base for the FIDInception* subclasses declared at module
            # level; never instantiated by these tests.
            def __init__(self, *a, **kw):
                super().__init__()

        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        inc = types.ModuleType("torchvision.models.inception")
        for cls in ("InceptionA", "InceptionB", "InceptionC",
                    "InceptionD", "InceptionE"):
            setattr(inc, cls, _Blk)
        tv.models.inception = inc
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.models.inception"] = inc
    sys.path.insert(0, "/root/reference")
    try:
        from third_party.pytorch_fid import fid_score as ref_fid
    finally:
        sys.path.remove("/root/reference")
    return ref_fid


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
def test_fid_matches_reference_pipeline(tmp_path):
    """End-to-end FID-number parity against the reference implementation
    (third_party/pytorch_fid/fid_score.py:139-252): the SAME random
    weights in the reference's own get_activations/mu/Sigma/sqrtm stack
    (via its public calculate_activation_statistics API) and in
    eval/fid.py, on identical PNG sets, must produce the same final FID.
    Covers the 299-resize protocol, feature extraction, statistics
    accumulation and sqrtm stabilisation jointly — not just pool3
    features (tests/test_fid_port.py)."""
    import os
    import sys
    import types

    torch = pytest.importorskip("torch")
    from PIL import Image

    from scripts.port_fid_weights import (build_torch_fid_inception,
                                          flax_template, port_state_dict)

    # --- identical random weights on both sides -----------------------
    torch.manual_seed(0)
    oracle = build_torch_fid_inception()
    sd = oracle.state_dict()
    gen = torch.Generator().manual_seed(1)
    for key, t in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith("running_var"):
            t.copy_(0.5 + torch.rand(t.shape, generator=gen))
        else:
            t.copy_(torch.randn(t.shape, generator=gen) * 0.1)
    oracle.load_state_dict(sd)
    oracle.eval()
    variables = port_state_dict(sd, flax_template())

    # --- identical PNG sets -------------------------------------------
    rs = np.random.RandomState(7)
    n_per_set, bs = 16, 8
    dirs = {}
    for name, shift in (("a", 0.0), ("b", 0.25)):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = d
        for i in range(n_per_set):
            img = np.clip(rs.rand(64, 64, 3) * 0.7 + shift, 0, 1)
            Image.fromarray(np.uint8(255 * img)).save(
                d / f"{i:03d}.png")

    # --- reference pipeline -------------------------------------------
    ref_fid = _import_ref_fid()

    class RefStyle(torch.nn.Module):
        """Adapts the oracle to the reference model contract:
        forward(x) -> [pool3 [N, 2048, 1, 1]] (fid_score.py:122-131)."""

        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x):
            return [self.net(x)[:, :, None, None]]

    wrapper = RefStyle(oracle)
    stats = {}
    with torch.no_grad():
        for name, d in dirs.items():
            files = sorted(d.glob("*.png"))
            stats[name] = ref_fid.calculate_activation_statistics(
                files, wrapper, batch_size=bs, dims=2048, cuda=False)
    ref_value = ref_fid.calculate_frechet_distance(
        *stats["a"], *stats["b"])

    # --- our pipeline on the same PNGs --------------------------------
    ext = F.InceptionExtractor(variables=variables)

    def batches(d):
        files = sorted(os.listdir(d))
        for i in range(0, len(files), bs):
            imgs = [np.asarray(Image.open(os.path.join(d, f)),
                               dtype=np.float32) / 255.0
                    for f in files[i:i + bs]]
            yield np.stack(imgs)

    mu_a, s_a = F.compute_statistics(batches(str(dirs["a"])), ext)
    mu_b, s_b = F.compute_statistics(batches(str(dirs["b"])), ext)
    our_value = F.frechet_distance(mu_a, s_a, mu_b, s_b)

    assert ref_value > 0
    np.testing.assert_allclose(our_value, ref_value, atol=1e-2,
                               rtol=1e-3)


@pytest.mark.slow
def test_inception_architecture_shapes():
    """The FID-Inception port produces 2048-d pool3 features."""
    from genesis_tpu.eval.inception import InceptionV3FID
    model = InceptionV3FID()
    x = jnp.zeros((2, 75, 75, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (2, 2048)
