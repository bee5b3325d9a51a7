"""Smoke + invariant tests for all four model families (tiny configs).

Promotes the reference's debug-mode runtime invariants (masks sum to one,
5-tuple contract, per-slot loss shapes — reference train.py:101-106 debug
path and misc.check_log_masks) into the test pyramid the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict


def tiny_cfg(**over):
    cfg = AttrDict(
        K_steps=3, img_size=32, pixel_bound=True, pixel_std1=0.7,
        pixel_std2=0.7, comp_ldim=8, comp_enc_channels=8,
        comp_dec_channels=8, comp_dec_layers=2, latent_dimension=16,
        pixel_std=0.7, feat_dim=32, montecarlo_kl=True, filter_start=8,
        attention_latents=16)
    cfg.update(over)
    return cfg


def _build_and_run(model, x, batch_size=2):
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "sample": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: model.init(rngs, x, True))()

    def fwd(v, x, k):
        return model.apply(v, x, True, rngs={"sample": k},
                           mutable=["batch_stats"])

    out, _ = jax.jit(fwd)(variables, x, jax.random.PRNGKey(2))

    def smp(v, k):
        return model.apply(v, batch_size, rngs={"sample": k},
                           method=model.sample)

    sample_out = jax.jit(smp)(variables, jax.random.PRNGKey(3))
    return variables, out, sample_out


def _check_contract(x, out, K=None, check_masks=("log_m_k",)):
    recon, losses, stats, att_stats, comp_stats = out
    assert recon.shape == x.shape
    assert losses["err"].shape == (x.shape[0],)
    assert np.isfinite(np.asarray(losses["err"])).all()
    for field in check_masks:
        masks = stats[field]
        assert masks.shape[0] == K
        np.testing.assert_allclose(
            np.asarray(jnp.exp(masks).sum(0)), 1.0, atol=1e-3)
        assert np.isfinite(np.asarray(masks)).all()


@pytest.mark.parametrize("broadcast_decoder", [False, True])
def test_baseline_vae(broadcast_decoder):
    from genesis_tpu.models import vae_config
    cfg = tiny_cfg(broadcast_decoder=broadcast_decoder)
    model = vae_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    _, out, (img, sstats) = _build_and_run(model, x)
    recon, losses, stats, att_stats, comp_stats = out
    assert recon.shape == x.shape
    assert losses["err"].shape == (2,)
    assert losses["kl_l"].shape == (2,)
    assert att_stats is None and comp_stats is None
    assert img.shape == (2, 32, 32, 3)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_monet():
    from genesis_tpu.models import monet_config
    cfg = tiny_cfg()
    model = monet_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    _, out, (img, sstats) = _build_and_run(model, x)
    _check_contract(x, out, K=3, check_masks=("log_m_k", "log_m_r_k"))
    _, losses, _, _, _ = out
    assert losses["kl_l_k"].shape == (3, 2)
    assert losses["kl_m"].shape == (2,)
    assert img.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("two_stage,autoreg,comp_prior", [
    (True, True, True),
    (True, False, False),
    (False, True, False),
])
def test_genesis(two_stage, autoreg, comp_prior):
    from genesis_tpu.models import genesis_config
    cfg = tiny_cfg(two_stage=two_stage, autoreg_prior=autoreg,
                   comp_prior=comp_prior, enc_norm="bn", dec_norm="bn")
    model = genesis_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    _, out, (img, sstats) = _build_and_run(model, x)
    _check_contract(x, out, K=3)
    recon, losses, stats, att_stats, comp_stats = out
    assert losses["kl_m_k"].shape == (3, 2)
    if two_stage:
        assert losses["kl_l_k"].shape == (3, 2)
        assert comp_stats["z_k"].shape == (3, 2, 8)
    assert att_stats["z_k"].shape == (3, 2, 16)
    assert att_stats["pmu_k"].shape == (3, 2, 16)
    # Samples: generated masks must also be normalised
    np.testing.assert_allclose(
        np.asarray(jnp.exp(sstats["log_m_k"]).sum(0)), 1.0, atol=1e-3)
    assert img.shape == (2, 32, 32, 3)


def test_genesis_comp_symmetric():
    from genesis_tpu.models import genesis_config
    cfg = tiny_cfg(comp_symmetric=True, enc_norm="bn", dec_norm="bn")
    model = genesis_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    _, out, _ = _build_and_run(model, x)
    _check_contract(x, out, K=3)


@pytest.mark.quick
@pytest.mark.parametrize("dynamic_K", [False, True])
def test_genesisv2(dynamic_K):
    from genesis_tpu.models import genesisv2_config
    cfg = tiny_cfg(dynamic_K=dynamic_K, klm_loss=True)
    model = genesisv2_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    _, out, (img, sstats) = _build_and_run(model, x)
    _check_contract(x, out, K=3, check_masks=("log_m_k", "log_m_r_k"))
    recon, losses, stats, att_stats, comp_stats = out
    assert losses["kl_l_k"].shape == (3, 2)
    assert losses["kl_m"].shape == (2,)
    assert comp_stats["z_k"].shape == (3, 2, 32)
    assert stats["instance_seg"].shape == (2, 32, 32)
    assert img.shape == (2, 32, 32, 3)


def test_genesisv2_slot_dtype_bf16():
    """slot_dtype=bfloat16 stores the slot-stacked decode tensors in
    bf16 (the HBM-dominant traffic, STATUS byte audit) while the mask
    log-softmax and loss accumulation stay float32. Same params as the
    stock f32 model; losses must agree to bf16 rounding tolerance."""
    from genesis_tpu.models import genesisv2_config
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    key = jax.random.PRNGKey(0)

    cfg32 = tiny_cfg(compute_dtype="float32")
    m32 = genesisv2_config.load(cfg32)
    variables = jax.jit(lambda: m32.init(
        {"params": key, "sample": key}, x, True))()

    cfg16 = tiny_cfg(compute_dtype="float32", slot_dtype="bfloat16")
    m16 = genesisv2_config.load(cfg16)

    def fwd(model):
        return jax.jit(lambda v, xx: model.apply(
            v, xx, True, rngs={"sample": jax.random.PRNGKey(2)}))(
                variables, x)

    r32, l32, s32, _, _ = fwd(m32)
    r16, l16, s16, _, _ = fwd(m16)
    # Storage dtypes: slot decode bf16, mask chain + losses f32.
    assert s16["x_r_k"].dtype == jnp.bfloat16
    assert s16["log_m_r_k"].dtype == jnp.float32
    assert l16["err"].dtype == jnp.float32
    assert r16.dtype == jnp.float32
    # Numerics: bf16 storage rounding only (loss math still f32).
    np.testing.assert_allclose(np.asarray(l16["err"]),
                               np.asarray(l32["err"]), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(r16), np.asarray(r32),
                               atol=2e-2)
    # Gradients through the bf16 decode are finite and non-zero.
    def loss_fn(params):
        _, losses, _, _, _ = m16.apply(
            {"params": params}, x, True,
            rngs={"sample": jax.random.PRNGKey(2)})
        return (jnp.mean(losses["err"])
                + jnp.mean(jnp.sum(losses["kl_l_k"], 0)))
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


def test_genesisv2_grads_flow():
    """End-to-end gradient: d(err + kl)/d(params) is finite and non-zero."""
    from genesis_tpu.models import genesisv2_config
    cfg = tiny_cfg()
    model = genesisv2_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3))
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": key, "sample": key}, x, True))()

    def loss_fn(params):
        _, losses, _, _, _ = model.apply(
            {"params": params}, x, True,
            rngs={"sample": jax.random.PRNGKey(2)})
        return (jnp.mean(losses["err"])
                + jnp.mean(jnp.sum(losses["kl_l_k"], 0)))

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0
