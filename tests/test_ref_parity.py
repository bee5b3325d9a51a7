"""Full-model golden parity against the torch reference.

Ports random reference state_dicts into the flax models
(scripts/port_ref_weights.py) and runs BOTH frameworks forward on the
same inputs with matched sampling noise (eps = 0 so z = mu on both
sides; one shared uniform field for the IC-SBP seed selection). Asserts
the complete loss/stat surface agrees:

  * GENESIS-V2: seeds, log_m_k, log_m_r_k, mu_k, err, kl_l_k, recon
    (reference models/genesisv2_config.py:110-203)
  * GENESIS (two_stage + comp_prior + LSTM prior, BatchNorm gated
    convs): log_m_k, att mu_k, err, kl_m_k, kl_l_k, recon
    (reference models/genesis_config.py:145-271)
  * MONet: log_m_k, log_m_r_k, err, kl_m, kl_l_k, recon
    (reference models/monet_config.py:74-128)
  * BaselineVAE (sylvester gated-conv VAE): err, kl_l, recon
    (reference models/vae_config.py:40-90)

This upgrades the block/law-level parity tests (test_blocks, test_losses)
to whole-model equivalence: same weights -> same losses.
"""

import os.path as osp

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from genesis_tpu.core import experiment as fet
from genesis_tpu.core.attrdict import AttrDict

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not osp.isdir(osp.join(REF, "models")),
    reason="torch reference checkout not available")

B, IMG = 2, 64


def _install_ref(monkeypatch):
    from scripts.ref_shim import install
    install()
    import modules.blocks as ref_B

    # torch 2.13 returns non-contiguous activations where the
    # reference's torch returned contiguous ones; .view -> .reshape is
    # behaviour-identical.
    monkeypatch.setattr(ref_B.Flatten, "forward",
                        lambda self, x: x.reshape(x.size(0), -1))


def _match_noise(monkeypatch, uniform_field=None):
    """eps=0 sampling on both sides; optional shared uniform field for
    IC-SBP seed selection (torch [B,1,H,W] / flax [B,H,W,1])."""
    from torch.distributions.normal import Normal

    monkeypatch.setattr(Normal, "rsample",
                        lambda self, *a, **k: self.mean.clone())
    orig_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    del orig_normal
    if uniform_field is not None:
        U = uniform_field
        orig_tu = torch.Tensor.uniform_

        def fake_tu(self, *a, **k):
            if tuple(self.shape) == (B, 1, IMG, IMG):
                with torch.no_grad():
                    self.copy_(torch.from_numpy(U[:, None]))
                return self
            return orig_tu(self, *a, **k)

        monkeypatch.setattr(torch.Tensor, "uniform_", fake_tu)
        orig_ju = jax.random.uniform

        def fake_ju(key, shape=(), dtype=jnp.float32, *a, **k):
            if tuple(shape) == (B, IMG, IMG, 1):
                return jnp.asarray(U[..., None], dtype)
            return orig_ju(key, shape, dtype, *a, **k)

        monkeypatch.setattr(jax.random, "uniform", fake_ju)


def _inputs():
    x_np = np.random.RandomState(42).rand(B, IMG, IMG, 3).astype(
        np.float32)
    return x_np, jnp.asarray(x_np), torch.from_numpy(
        x_np.transpose(0, 3, 1, 2))


def _apply_flax(model, vs, xj):
    return model.apply(vs, xj, False, rngs={"sample": jax.random.PRNGKey(3)})


def _stack(tensors):
    return np.stack([t.detach().numpy() for t in tensors])


def test_convT_torch_alignment():
    """B.ConvT with torch-style int padding reproduces torch
    ConvTranspose2d(k5, s2, p2, op1) EXACTLY (same alignment, not just
    shape) under the flip+transpose weight conversion."""
    from flax import linen as nn

    from scripts.port_ref_weights import convT_w

    torch.manual_seed(0)
    tconv = torch.nn.ConvTranspose2d(6, 4, 5, 2, 2, 1)
    x = np.random.RandomState(0).randn(2, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        yt = tconv(torch.from_numpy(x)).numpy()
    from genesis_tpu.ops import blocks as Bl
    fl = Bl.ConvT(4, 5, 2, 2)
    params = {"params": {"kernel": jnp.asarray(convT_w(tconv.weight)),
                         "bias": jnp.asarray(
                             tconv.bias.detach().numpy())}}
    yj = np.asarray(fl.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(yj.transpose(0, 3, 1, 2), yt, atol=1e-5)


def test_genesisv2_forward_parity(monkeypatch):
    _install_ref(monkeypatch)
    import models.genesisv2_config as ref_v2

    from scripts.port_ref_weights import (check_against_template,
                                          port_genesisv2)

    K = 5
    cfg = AttrDict(K_steps=K, pixel_bound=True, feat_dim=64,
                   klm_loss=False, detach_mr_in_klm=True, dynamic_K=False,
                   debug=False, multi_gpu=False, img_size=IMG,
                   kernel="gaussian", semiconv=True, autoreg_prior=True,
                   pixel_std1=0.7, pixel_std2=0.7, batch_size=B,
                   montecarlo_kl=True, scan_unroll=1,
                   compute_dtype="float32", pallas_icsbp=False)
    torch.manual_seed(0)
    ref = ref_v2.GenesisV2(cfg)
    ref.eval()
    sd = ref.state_dict()

    model = fet.load("genesis_tpu/models/genesisv2_config.py", cfg)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    vs = port_genesisv2(sd, IMG, 64)
    check_against_template(vs, {"params": tmpl["params"]})

    U = np.random.RandomState(7).rand(B, IMG, IMG).astype(np.float32)
    _match_noise(monkeypatch, uniform_field=U)

    with torch.no_grad():
        r_recon, r_losses, r_stats, r_att, r_comp = ref(xt)
    recon, losses, stats, att_stats, comp_stats = _apply_flax(
        model, vs, xj)

    np.testing.assert_allclose(np.asarray(att_stats["seeds"]),
                               _stack(r_att["seeds"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["log_m_k"])[..., 0],
        _stack(r_stats["log_m_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats["log_m_r_k"])[..., 0],
        _stack(r_stats["log_m_r_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(comp_stats["mu_k"]),
                               _stack(r_comp["mu_k"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["err"]),
                               r_losses["err"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_l_k"]),
                               _stack(r_losses["kl_l_k"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon), r_recon.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)


def test_genesis_forward_parity(monkeypatch):
    _install_ref(monkeypatch)
    import models.genesis_config as ref_g

    from scripts.port_ref_weights import (check_against_template,
                                          port_genesis)

    cfg = AttrDict(K_steps=5, img_size=IMG, two_stage=True,
                   autoreg_prior=True, comp_prior=True,
                   attention_latents=64, enc_norm="bn", dec_norm="bn",
                   comp_enc_channels=32, comp_ldim=16,
                   comp_dec_channels=32, comp_dec_layers=4,
                   comp_symmetric=False, pixel_bound=True, pixel_std1=0.7,
                   pixel_std2=0.7, montecarlo_kl=True, debug=False,
                   batch_size=B, compute_dtype="float32", scan_unroll=1)
    torch.manual_seed(0)
    ref = ref_g.Genesis(cfg)
    ref.eval()
    sd = ref.state_dict()
    # Non-trivial BatchNorm running stats so the port is actually tested.
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for k, v in sd.items():
            if k.endswith("running_mean"):
                v.copy_(0.1 * torch.randn(v.shape, generator=g))
            elif k.endswith("running_var"):
                v.copy_(0.5 + torch.rand(v.shape, generator=g))
    ref.load_state_dict(sd)

    model = fet.load("genesis_tpu/models/genesis_config.py", cfg)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    vs = port_genesis(sd, IMG)
    check_against_template(vs, {c: tmpl[c] for c in vs})

    _match_noise(monkeypatch)
    with torch.no_grad():
        r_recon, r_losses, r_stats, r_att, r_comp = ref(xt)
    recon, losses, stats, att_stats, comp_stats = _apply_flax(
        model, vs, xj)

    np.testing.assert_allclose(
        np.asarray(stats["log_m_k"])[..., 0],
        _stack(r_stats["log_m_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(att_stats["mu_k"]),
                               _stack(r_att["mu_k"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["err"]),
                               r_losses["err"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_m_k"]),
                               _stack(r_losses["kl_m_k"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(losses["kl_l_k"]),
                               _stack(r_losses["kl_l_k"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon), r_recon.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)


def test_monet_forward_parity(monkeypatch):
    _install_ref(monkeypatch)
    import models.monet_config as ref_m

    from scripts.port_ref_weights import (check_against_template,
                                          port_monet)

    cfg = AttrDict(K_steps=5, img_size=IMG, filter_start=32,
                   prior_mode="softmax", montecarlo_kl=True, debug=False,
                   pixel_bound=True, pixel_std1=0.7, pixel_std2=0.7,
                   comp_enc_channels=32, comp_ldim=16,
                   comp_dec_channels=32, comp_dec_layers=4, batch_size=B,
                   compute_dtype="float32", scan_unroll=1)
    torch.manual_seed(0)
    ref = ref_m.MONet(cfg)
    ref.eval()
    sd = ref.state_dict()

    model = fet.load("genesis_tpu/models/monet_config.py", cfg)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    vs = port_monet(sd, IMG)
    check_against_template(vs, {"params": tmpl["params"]})

    _match_noise(monkeypatch)
    with torch.no_grad():
        r_recon, r_losses, r_stats, r_att, r_comp = ref(xt)
    recon, losses, stats, att_stats, comp_stats = _apply_flax(
        model, vs, xj)

    np.testing.assert_allclose(
        np.asarray(stats["log_m_k"])[..., 0],
        _stack(r_stats["log_m_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats["log_m_r_k"])[..., 0],
        _stack(r_stats["log_m_r_k"])[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["err"]),
                               r_losses["err"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_m"]),
                               r_losses["kl_m"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_l_k"]),
                               _stack(r_losses["kl_l_k"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon), r_recon.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)


def test_vae_forward_parity(monkeypatch):
    _install_ref(monkeypatch)
    import models.vae_config as ref_v

    from scripts.port_ref_weights import (check_against_template,
                                          port_vae)

    cfg = AttrDict(latent_dimension=64, broadcast_decoder=False,
                   pixel_bound=True, pixel_std=0.7, img_size=IMG,
                   debug=False, batch_size=B, compute_dtype="float32",
                   scan_unroll=1, K_steps=3, planar_flow=False)
    torch.manual_seed(0)
    ref = ref_v.BaselineVAE(cfg)
    ref.eval()
    sd = ref.state_dict()

    model = fet.load("genesis_tpu/models/vae_config.py", cfg)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    vs = port_vae(sd)
    check_against_template(vs, {"params": tmpl["params"]})

    _match_noise(monkeypatch)
    with torch.no_grad():
        r_recon, r_losses, r_stats, _, _ = ref(xt)
    recon, losses, stats, _, _ = _apply_flax(model, vs, xj)

    np.testing.assert_allclose(np.asarray(losses["err"]),
                               r_losses["err"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_l"]),
                               r_losses["kl_l"].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon), r_recon.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)


def test_genesis_comp_symmetric_forward_parity(monkeypatch):
    """comp_symmetric=True swaps the component VAE's MONet encoder /
    broadcast decoder for sylvester gated stacks (reference
    models/genesis_config.py:102-119) — the one Genesis wiring the base
    parity test doesn't reach."""
    _install_ref(monkeypatch)
    import models.genesis_config as ref_g

    from scripts.port_ref_weights import (check_against_template,
                                          port_genesis)

    cfg = AttrDict(K_steps=5, img_size=IMG, two_stage=True,
                   autoreg_prior=True, comp_prior=True,
                   attention_latents=64, enc_norm="bn", dec_norm="bn",
                   comp_enc_channels=32, comp_ldim=16,
                   comp_dec_channels=32, comp_dec_layers=4,
                   comp_symmetric=True, pixel_bound=True, pixel_std1=0.7,
                   pixel_std2=0.7, montecarlo_kl=True, debug=False,
                   batch_size=B, compute_dtype="float32", scan_unroll=1)
    torch.manual_seed(0)
    ref = ref_g.Genesis(cfg)
    ref.eval()
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for k, v in sd.items():
            if k.endswith("running_mean"):
                v.copy_(0.1 * torch.randn(v.shape, generator=g))
            elif k.endswith("running_var"):
                v.copy_(0.5 + torch.rand(v.shape, generator=g))
    ref.load_state_dict(sd)

    model = fet.load("genesis_tpu/models/genesis_config.py", cfg)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    vs = port_genesis(sd, IMG)
    check_against_template(vs, {c: tmpl[c] for c in vs})

    _match_noise(monkeypatch)
    with torch.no_grad():
        r_recon, r_losses, r_stats, r_att, r_comp = ref(xt)
    recon, losses, stats, att_stats, comp_stats = _apply_flax(
        model, vs, xj)

    np.testing.assert_allclose(np.asarray(losses["err"]),
                               r_losses["err"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses["kl_l_k"]),
                               _stack(r_losses["kl_l_k"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon), r_recon.numpy().transpose(0, 2, 3, 1),
        atol=1e-5)
