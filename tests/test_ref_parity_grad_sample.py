"""Gradient and sample-path golden parity vs the torch reference.

Closes the correctness chain on top of the forward parity in
test_ref_parity.py (VERDICT r4 #1):

  * Gradient parity: port reference weights, run ONE backward on both
    frameworks with the same scalar loss (err.mean + sum of KL-term
    means — the training objective's structure) and matched sampling
    noise, port the torch grads through the SAME linear weight
    transforms, and assert the jax.grad tree matches <=1e-4. This
    certifies the stop-gradient/clamp/detach sites the forward tests
    can't see (reference modules/blocks.py:18-20 clamp_preserve_gradients,
    models/genesis_config.py:253 detached decodes).
  * Sample-path parity: matched-noise (all-zeros eps) ancestral
    sampling on both sides — the LSTM-prior rollout + masks_from_zm_k /
    decode_latents chain FID depends on (reference
    models/genesis_config.py:345-425, genesisv2_config.py:227-256,
    monet_config.py:172-198, vae_config.py:89-96).
"""

import os.path as osp

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from genesis_tpu.core import experiment as fet
from genesis_tpu.core.attrdict import AttrDict

from test_ref_parity import (B, IMG, _install_ref, _match_noise, _inputs,
                             _stack)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not osp.isdir(osp.join(REF, "models")),
    reason="torch reference checkout not available")


def _match_sample_noise(monkeypatch):
    """Zero-eps ancestral sampling on both sides: torch Normal.sample
    (the reference sample() paths use .sample, not .rsample) returns the
    distribution mean; jax.random.normal returns zeros."""
    _match_noise(monkeypatch)
    from torch.distributions.normal import Normal

    def fake_sample(self, sample_shape=torch.Size()):
        shape = torch.Size(sample_shape)
        return self.mean.expand(shape + self.mean.shape).clone()

    monkeypatch.setattr(Normal, "sample", fake_sample)


def _flax_sample(model, vs, batch_size):
    return model.apply(vs, batch_size,
                       rngs={"sample": jax.random.PRNGKey(3)},
                       method=model.sample)


# ---------------------------------------------------------------------------
# Shared gradient-parity machinery
# ---------------------------------------------------------------------------

def _torch_loss(r_losses):
    """err.mean + sum of per-term means — the same reduction structure
    the trainer feeds GECO (reference train.py:227-246)."""
    loss = r_losses["err"].mean()
    for term in ("kl_m_k", "kl_l_k"):
        if term in r_losses and r_losses[term] is not None:
            for t in r_losses[term]:
                loss = loss + t.mean()
    for term in ("kl_m", "kl_l"):
        if term in r_losses and r_losses[term] is not None:
            loss = loss + r_losses[term].mean()
    return loss


def _jax_loss(losses):
    loss = jnp.mean(losses["err"])
    for term in ("kl_m_k", "kl_l_k"):
        if term in losses:
            loss = loss + jnp.sum(jnp.mean(losses[term], axis=1))
    for term in ("kl_m", "kl_l"):
        if term in losses:
            loss = loss + jnp.mean(losses[term])
    return loss


def _torch_grad_sd(ref, xt):
    """One backward on the reference; returns a state_dict-shaped dict
    with parameter entries replaced by their gradients (buffers keep
    their values so the port transforms can run unchanged)."""
    r_out = ref(xt)
    _torch_loss(r_out[1]).backward()
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    for name, p in ref.named_parameters():
        g = (p.grad.detach().clone() if p.grad is not None
             else torch.zeros_like(p))
        # The port folds bias_ih + bias_hh into flax's single LSTM bias
        # (port_ref_weights.py:81). The adjoint of that sum maps the flax
        # bias grad to EACH torch bias grad identically, so running the
        # grads through the same (linear) port would double-count; halve
        # both so their fold reproduces the true flax-bias cotangent.
        if name.endswith(("bias_ih_l0", "bias_hh_l0")):
            g = g * 0.5
        sd[name] = g
    return sd


def _assert_grad_tree(jax_grads, ported_grads, atol=1e-4, rel_max=1e-6):
    """Per-parameter comparison. `rel_max` bounds max|Δ| / max|g| — the
    right metric for gradients, whose near-zero entries are catastrophic
    cancellations where elementwise rtol is meaningless."""
    flat_j = jax.tree_util.tree_leaves_with_path(jax_grads)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(ported_grads))
    assert len(flat_j) == len(flat_p)
    for path, g in flat_j:
        gp = np.asarray(flat_p[path])
        gj = np.asarray(g)
        ad = float(np.abs(gj - gp).max())
        scale = float(np.abs(gp).max())
        assert ad <= atol + rel_max * scale, (
            f"grad mismatch at {jax.tree_util.keystr(path)}: "
            f"max|d|={ad:.3e}, rel_to_max={ad / (scale + 1e-12):.3e}")


def _jax_grads(model, vs, xj):
    extra = {c: vs[c] for c in vs if c != "params"}

    def loss_fn(params):
        out = model.apply({"params": params, **extra}, xj, False,
                          rngs={"sample": jax.random.PRNGKey(3)})
        return _jax_loss(out[1])

    return jax.grad(loss_fn)(vs["params"])


def _grad_parity_f64(ref, model, vs, xj, xt, port_grads):
    """One backward on both frameworks in float64 and compare the full
    grad tree at near-machine tolerance. f64 is load-bearing: in f32 the
    10-block IN/GN UNet backward accumulates ~1e-1 relative rounding
    noise that would force a tolerance too loose to certify anything
    (verified: the same comparison in f64 sits at ~4e-8 relative)."""
    from jax._src.config import enable_x64

    grad_sd = _torch_grad_sd(ref.double(), xt.double())
    ported = port_grads(grad_sd)["params"]
    with enable_x64(True):
        f64 = lambda t: jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t)
        jg = _jax_grads(model, f64(vs), f64(xj))
        _assert_grad_tree(jg, ported, atol=1e-7, rel_max=1e-6)


# ---------------------------------------------------------------------------
# GENESIS-V2
# ---------------------------------------------------------------------------

def _v2_setup(monkeypatch, K=5):
    _install_ref(monkeypatch)
    import models.genesisv2_config as ref_v2

    from scripts.port_ref_weights import (check_against_template,
                                          port_genesisv2)

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
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    model = fet.load("genesis_tpu/models/genesisv2_config.py", cfg)
    vs = port_genesisv2(sd, IMG, 64)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    check_against_template(vs, {"params": tmpl["params"]})
    return ref, model, vs, xj, xt, port_genesisv2


def test_genesisv2_grad_parity(monkeypatch):
    ref, model, vs, xj, xt, port = _v2_setup(monkeypatch)
    U = np.random.RandomState(7).rand(B, IMG, IMG).astype(np.float32)
    _match_noise(monkeypatch, uniform_field=U)
    _grad_parity_f64(ref, model, vs, xj, xt,
                     lambda sd: port(sd, IMG, 64))


def test_genesisv2_sample_parity(monkeypatch):
    ref, model, vs, xj, xt, _ = _v2_setup(monkeypatch)
    _match_sample_noise(monkeypatch)

    with torch.no_grad():
        r_img, r_stats = ref.sample(B)
    img, stats = _flax_sample(model, vs, B)

    np.testing.assert_allclose(
        np.asarray(stats["log_m_k"])[..., 0],
        _stack(r_stats["log_m_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats["x_k"]),
        _stack(r_stats["x_k"]).transpose(0, 1, 3, 4, 2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(img), r_img.numpy().transpose(0, 2, 3, 1), atol=1e-5)


# ---------------------------------------------------------------------------
# GENESIS (two-stage)
# ---------------------------------------------------------------------------

def _genesis_setup(monkeypatch, comp_symmetric=False):
    _install_ref(monkeypatch)
    import models.genesis_config as ref_g

    from scripts.port_ref_weights import (check_against_template,
                                          port_genesis)

    cfg = AttrDict(K_steps=5, img_size=IMG, two_stage=True,
                   autoreg_prior=True, comp_prior=True,
                   attention_latents=64, enc_norm="bn", dec_norm="bn",
                   comp_enc_channels=32, comp_ldim=16,
                   comp_dec_channels=32, comp_dec_layers=4,
                   comp_symmetric=comp_symmetric, pixel_bound=True,
                   pixel_std1=0.7, pixel_std2=0.7, montecarlo_kl=True,
                   debug=False, batch_size=B, compute_dtype="float32",
                   scan_unroll=1)
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
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    model = fet.load("genesis_tpu/models/genesis_config.py", cfg)
    vs = port_genesis(sd, IMG)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    check_against_template(vs, {c: tmpl[c] for c in vs})
    return ref, model, vs, xj, xt, port_genesis


def test_genesis_grad_parity(monkeypatch):
    ref, model, vs, xj, xt, port = _genesis_setup(monkeypatch)
    _match_noise(monkeypatch)
    _grad_parity_f64(ref, model, vs, xj, xt, lambda sd: port(sd, IMG))


def test_genesis_sample_parity(monkeypatch):
    ref, model, vs, xj, xt, _ = _genesis_setup(monkeypatch)
    _match_sample_noise(monkeypatch)

    with torch.no_grad():
        r_img, r_stats = ref.sample(B)
    img, stats = _flax_sample(model, vs, B)

    np.testing.assert_allclose(
        np.asarray(stats["log_m_k"])[..., 0],
        _stack(r_stats["log_m_k"])[:, :, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats["x_k"]),
        _stack(r_stats["x_k"]).transpose(0, 1, 3, 4, 2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(img), r_img.numpy().transpose(0, 2, 3, 1), atol=1e-5)


# ---------------------------------------------------------------------------
# MONet
# ---------------------------------------------------------------------------

def _monet_setup(monkeypatch):
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
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    model = fet.load("genesis_tpu/models/monet_config.py", cfg)
    vs = port_monet(sd, IMG)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    check_against_template(vs, {"params": tmpl["params"]})
    return ref, model, vs, xj, xt, port_monet


def test_monet_grad_parity(monkeypatch):
    ref, model, vs, xj, xt, port = _monet_setup(monkeypatch)
    _match_noise(monkeypatch)
    _grad_parity_f64(ref, model, vs, xj, xt, lambda sd: port(sd, IMG))


def test_monet_sample_parity(monkeypatch):
    ref, model, vs, xj, xt, _ = _monet_setup(monkeypatch)
    _match_sample_noise(monkeypatch)

    with torch.no_grad():
        r_img, r_stats = ref.sample(B)
    img, stats = _flax_sample(model, vs, B)

    # Ref log_m_k may contain log(0) = -inf where softmax mass vanishes;
    # compare in mask space.
    np.testing.assert_allclose(
        np.exp(np.asarray(stats["log_m_k"]))[..., 0],
        np.exp(_stack(r_stats["log_m_k"]))[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["x_k"]),
        _stack(r_stats["x_k"]).transpose(0, 1, 3, 4, 2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(img), r_img.numpy().transpose(0, 2, 3, 1), atol=1e-5)


# ---------------------------------------------------------------------------
# BaselineVAE
# ---------------------------------------------------------------------------

def _vae_setup(monkeypatch):
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
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    model = fet.load("genesis_tpu/models/vae_config.py", cfg)
    vs = port_vae(sd)
    x_np, xj, xt = _inputs()
    tmpl = model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, xj, True)
    check_against_template(vs, {"params": tmpl["params"]})
    return ref, model, vs, xj, xt, port_vae


def test_vae_grad_parity(monkeypatch):
    ref, model, vs, xj, xt, port = _vae_setup(monkeypatch)
    _match_noise(monkeypatch)
    _grad_parity_f64(ref, model, vs, xj, xt, lambda sd: port(sd))


def test_vae_sample_parity(monkeypatch):
    ref, model, vs, xj, xt, _ = _vae_setup(monkeypatch)
    _match_sample_noise(monkeypatch)

    with torch.no_grad():
        r_img, _ = ref.sample(B)
    img, _ = _flax_sample(model, vs, B)

    np.testing.assert_allclose(
        np.asarray(img), r_img.numpy().transpose(0, 2, 3, 1), atol=1e-5)
