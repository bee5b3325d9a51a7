"""Per-forward debug invariants (reference genesis_config.py:267-269,
genesisv2_config.py:191-196, monet_config.py:122-126,
attention.py:207-210) — jit-safe checks via scalar-reducing
jax.debug.callback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops import debug_checks as D


def _uniform_masks(K=3, B=2, H=4, W=4):
    return jnp.log(jnp.full((K, B, H, W, 1), 1.0 / K))


def test_check_log_masks_passes_under_jit():
    f = jax.jit(lambda m: (D.check_log_masks(m), jnp.sum(m))[1])
    out = f(_uniform_masks())
    assert np.isfinite(float(out))


@pytest.mark.parametrize("corruption", ["sum", "nan"])
def test_check_log_masks_raises(corruption):
    m = _uniform_masks()
    if corruption == "sum":
        m = m + 0.5  # masks now sum to ~1.65
    else:
        m = m.at[0, 0, 0, 0, 0].set(jnp.nan)
    f = jax.jit(lambda m: (D.check_log_masks(m), jnp.sum(m))[1])
    with pytest.raises(Exception, match="[Mm]ask|NaN|callback"):
        f(m).block_until_ready()


def test_check_alpha_range():
    ok = jnp.asarray([[0.0, 0.5, 1.0]])
    f = jax.jit(lambda a: (D.check_alpha_range(a), jnp.sum(a))[1])
    f(ok).block_until_ready()
    with pytest.raises(Exception, match="alpha|callback"):
        f(jnp.asarray([[1.2]])).block_until_ready()


def _tiny_v2_cfg(**kw):
    cfg = AttrDict(
        K_steps=3, img_size=32, feat_dim=32, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, compute_dtype="float32",
        pallas_icsbp=False, debug=True)
    cfg.update(kw)
    return cfg


def test_genesisv2_debug_forward_clean():
    """debug=True threads the invariants through a full forward; healthy
    masks pass silently (and the flag reaches the attention process)."""
    from genesis_tpu.models import genesisv2_config
    model = genesisv2_config.load(_tiny_v2_cfg())
    assert model.debug  # att_process.debug threaded in setup()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    key = jax.random.PRNGKey(1)
    variables = model.init({"params": key, "sample": key}, x, True)
    recon, losses, stats, _, _ = model.apply(
        variables, x, True, rngs={"sample": jax.random.PRNGKey(2)})
    jax.block_until_ready(recon)
    # Explicitly validate what the in-graph check certified.
    summed = np.exp(np.asarray(stats["log_m_k"])).sum(0)
    np.testing.assert_allclose(summed, 1.0, atol=1e-3)


def test_genesis_eval_forward_runs_check():
    """Genesis gates on (debug or not train): an eval forward exercises
    the invariant even with debug=False (reference genesis_config.py:267)."""
    from genesis_tpu.models import genesis_config
    cfg = AttrDict(
        K_steps=3, img_size=32, montecarlo_kl=True, comp_ldim=8,
        comp_enc_channels=8, comp_dec_channels=8, comp_dec_layers=2,
        pixel_bound=True, pixel_std1=0.7, pixel_std2=0.7,
        enc_norm="gn", dec_norm="gn", compute_dtype="float32")
    model = genesis_config.load(cfg)
    assert not model.debug
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    key = jax.random.PRNGKey(1)
    variables = model.init({"params": key, "sample": key}, x, True)
    recon, _, _, _, _ = model.apply(
        variables, x, False, rngs={"sample": jax.random.PRNGKey(2)})
    jax.block_until_ready(recon)
