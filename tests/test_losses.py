"""Golden-value tests for loss math against torch oracles implementing the
reference equations directly (no reference code copied — the formulas are
re-derived from genesis_config.py:273-343, monet_config.py:135-170)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch.distributions.normal import Normal
from torch.distributions.categorical import Categorical
from torch.distributions.kl import kl_divergence

from genesis_tpu.ops import losses as L
from genesis_tpu.ops import geco as G

RS = np.random.RandomState(42)


def _mask_stack(K, B, H, W):
    logits = RS.rand(K, B, H, W, 1).astype(np.float32) * 4 - 2
    log_m = np.log(np.exp(logits) / np.exp(logits).sum(0, keepdims=True))
    return log_m


def test_x_loss_matches_torch_oracle():
    K, B_, H, W, C = 4, 2, 6, 6, 3
    x = RS.rand(B_, H, W, C).astype(np.float32)
    x_r = RS.rand(K, B_, H, W, C).astype(np.float32)
    log_m = _mask_stack(K, B_, H, W)
    std = np.full((K,), 0.7, np.float32)
    std[0] = 0.3

    ours = np.asarray(L.x_loss(jnp.asarray(x), jnp.asarray(log_m),
                               jnp.asarray(x_r), jnp.asarray(std)))

    # torch oracle: -log sum_k exp(log m_k + log N(x; x_r_k, std_k)),
    # sum over C,H,W (reference genesis_config.py:273-286; NCHW there)
    xt = torch.tensor(np.moveaxis(x, -1, 1))                # [B,C,H,W]
    xr_t = torch.tensor(np.moveaxis(x_r, -1, 2))            # [K,B,C,H,W]
    lm_t = torch.tensor(np.moveaxis(log_m, -1, 2))          # [K,B,1,H,W]
    std_t = torch.tensor(std).view(K, 1, 1, 1, 1)
    log_xr = Normal(xr_t, std_t).log_prob(xt.unsqueeze(0))
    log_mx = lm_t + log_xr
    err_ppc = -torch.log(log_mx.exp().sum(dim=0))
    oracle = err_ppc.sum(dim=(1, 2, 3)).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_mc_kl_matches_torch():
    B_, D = 5, 7
    z = RS.randn(B_, D).astype(np.float32)
    qm = RS.randn(B_, D).astype(np.float32)
    qs = np.abs(RS.randn(B_, D)).astype(np.float32) + 0.5
    pm = RS.randn(B_, D).astype(np.float32)
    ps = np.abs(RS.randn(B_, D)).astype(np.float32) + 0.5
    ours = np.asarray(L.get_mc_kl(*map(jnp.asarray, (z, qm, qs, pm, ps))))
    oracle = (Normal(torch.tensor(qm), torch.tensor(qs))
              .log_prob(torch.tensor(z))
              - Normal(torch.tensor(pm), torch.tensor(ps))
              .log_prob(torch.tensor(z))).sum(-1).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_kl_m_loss_matches_torch_categorical():
    K, B_, H, W = 3, 2, 4, 4
    log_m = _mask_stack(K, B_, H, W)
    log_m_r = _mask_stack(K, B_, H, W)
    ours = np.asarray(L.kl_m_loss(jnp.asarray(log_m), jnp.asarray(log_m_r)))
    # torch oracle (monet_config.py:157-170)
    m = torch.tensor(np.exp(log_m)).clamp(min=1e-5)
    mr = torch.tensor(np.exp(log_m_r)).clamp(min=1e-5)
    q = Categorical(m.permute(1, 2, 3, 4, 0).reshape(-1, K))
    p = Categorical(mr.permute(1, 2, 3, 4, 0).reshape(-1, K))
    oracle = kl_divergence(q, p).view(B_, -1).sum(-1).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_mask_recon_stack_softmax_and_scope():
    K, B_, H, W = 4, 2, 3, 3
    logits = jnp.asarray(RS.randn(K, B_, H, W, 1).astype(np.float32))
    log_soft = L.get_mask_recon_stack(logits, "softmax", log=True)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_soft).sum(0)), 1.0, atol=1e-3)
    log_scope = L.get_mask_recon_stack(logits, "scope", log=True)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_scope).sum(0)), 1.0, atol=1e-3)
    # Scope mode: step 0 mask is logsigmoid(logit_0)
    np.testing.assert_allclose(
        np.asarray(log_scope[0]),
        np.asarray(jax.nn.log_sigmoid(logits[0])), rtol=1e-5)


def _reference_geco_torch(goal, step_size, alpha, beta_init, beta_min,
                          speedup, errs, klds):
    """Torch re-implementation of the reference GECO law
    (utils/geco.py:35-51) used as an oracle."""
    beta = torch.tensor(beta_init)
    err_ema = None
    losses, betas = [], []
    for err, kld in zip(errs, klds):
        err, kld = torch.tensor(err), torch.tensor(kld)
        losses.append(float(err + beta * kld))
        if err_ema is None:
            err_ema = err
        else:
            err_ema = (1.0 - alpha) * err + alpha * err_ema
        constraint = goal - err_ema
        if speedup is not None and constraint.item() > 0:
            factor = torch.exp(speedup * step_size * constraint)
        else:
            factor = torch.exp(step_size * constraint)
        beta = (factor * beta).clamp(beta_min, 1e10)
        betas.append(float(beta))
    return losses, betas


@pytest.mark.quick
def test_geco_matches_reference_law():
    goal, lr, alpha, b0, bmin, speedup = 80.0, 1e-2, 0.9, 1.0, 1e-10, 10.0
    errs = [120.0, 100.0, 70.0, 60.0, 90.0]
    klds = [30.0, 25.0, 20.0, 18.0, 22.0]
    oracle_losses, oracle_betas = _reference_geco_torch(
        goal, lr, alpha, b0, bmin, speedup, errs, klds)
    state = G.init(goal, lr, alpha, b0, bmin, speedup=speedup)
    step = jax.jit(G.loss)
    for i, (err, kld) in enumerate(zip(errs, klds)):
        loss, state = step(state, jnp.asarray(err), jnp.asarray(kld))
        np.testing.assert_allclose(float(loss), oracle_losses[i], rtol=1e-5)
        np.testing.assert_allclose(float(state["beta"]), oracle_betas[i],
                                   rtol=1e-5)


def test_geco_no_speedup_branch():
    state = G.init(100.0, 1e-2, 0.5, 1.0, 1e-10, speedup=None)
    # err above goal -> negative constraint -> beta shrinks
    _, s1 = G.loss(state, jnp.asarray(150.0), jnp.asarray(10.0))
    assert float(s1["beta"]) < 1.0
    # err below goal -> beta grows (no speedup multiplier)
    _, s2 = G.loss(state, jnp.asarray(50.0), jnp.asarray(10.0))
    assert float(s2["beta"]) > 1.0


def test_mask_latent_loss_standard_normal_prior():
    K, B_, D = 3, 2, 4
    mu = jnp.asarray(RS.randn(K, B_, D).astype(np.float32))
    sigma = jnp.asarray(np.abs(RS.randn(K, B_, D)).astype(np.float32) + 0.5)
    z = mu  # deterministic "sample"
    kl, p_mu, p_sigma = L.mask_latent_loss(mu, sigma, z, prior=None)
    assert kl.shape == (K, B_)
    oracle = (Normal(torch.tensor(np.asarray(mu)),
                     torch.tensor(np.asarray(sigma)))
              .log_prob(torch.tensor(np.asarray(z)))
              - Normal(0., 1.).log_prob(torch.tensor(np.asarray(z)))
              ).sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(kl), oracle, rtol=1e-4, atol=1e-4)
