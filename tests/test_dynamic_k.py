"""dynamic_K parity against a batch-1 serial oracle of the reference's
break-and-drop law (reference modules/attention.py:218-219 +
models/genesisv2_config.py:118-137).

The reference, at batch 1 (its only dynamic_K use), breaks the SBP loop
at the first step whose mask mass falls below the threshold, appends the
current scope as the final slot, and the model then runs pooling/decode/
KL over ONLY those live slots. Our implementation keeps the static [K]
slot shape, pads dead slots with LOG_ZERO, excludes them from the decode
softmax, and zeroes their latent KL. These tests pin:

  1. the mask law: batched dynamic_K output == serial reference law
     applied to the full (no-break) rollout, per element;
  2. prior causality: truncating the slot sequence == masking (the
     ground for zeroing dead-slot KL instead of dropping);
  3. model-level: dead slots carry zero KL and zero recon mass, and the
     live-slot softmax renormalises over live slots only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops.attention import LOG_ZERO, InstanceColouringSBP

IMG = 16
THRESH = 40.0  # high threshold so 16x16=256px rollouts actually break


def _run_sbp(dynamic_K, key=0, steps=5, bsz=4, threshold=THRESH):
    mod = InstanceColouringSBP(
        img_size=IMG, kernel="gaussian", colour_dim=4, K_steps=steps + 1,
        feat_dim=8, semiconv=True, dynamic_K_threshold=threshold,
        use_pallas=False)
    feat = jax.random.uniform(jax.random.PRNGKey(123), (bsz, IMG, IMG, 8))
    k = jax.random.PRNGKey(key)
    variables = mod.init({"params": k, "sample": k}, feat, steps, True)
    out = mod.apply(variables, feat, steps, True,
                    dynamic_K=dynamic_K,
                    rngs={"sample": jax.random.PRNGKey(7)})
    return out  # (log_m_full [S+1,B,H,W,1], log_s_all [S+1,...], stats)


def _serial_reference_law(log_m, log_s_all, threshold):
    """Reference break-and-drop law per batch element, from the full
    rollout: slots = [m_0..m_{t-1}, s_t, LOG_ZERO...] where t is the
    first step with mass(m_t) < threshold (attention.py:218-219 break
    before append; genesisv2_config.py:128 pads with -1e10)."""
    S, B = log_m.shape[0], log_m.shape[1]
    out = np.full((S + 1,) + log_m.shape[1:], LOG_ZERO, np.float32)
    breaks = []
    for b in range(B):
        t = S
        for step in range(S):
            if np.exp(log_m[step, b]).sum() < threshold:
                t = step
                break
        for step in range(t):
            out[step, b] = log_m[step, b]
        out[t, b] = log_s_all[t, b]
        breaks.append(t)
    return out, breaks


def test_dynamic_k_masks_match_serial_oracle():
    """Batched static-shape dynamic_K == the serial reference law."""
    # Same params + same rng: the no-break rollout prefix is identical,
    # so the full rollout is a valid substrate for the serial law.
    full_m, full_s, _ = _run_sbp(dynamic_K=False)
    dyn_m, dyn_s, _ = _run_sbp(dynamic_K=True)
    # dynamic_K=False appends the final scope; strip to the raw steps.
    log_m_steps = np.asarray(full_m)[:-1]
    expected, breaks = _serial_reference_law(
        log_m_steps, np.asarray(full_s), THRESH)
    assert any(t < log_m_steps.shape[0] for t in breaks), \
        f"no element broke (breaks={breaks}) — raise THRESH"
    assert len(set(breaks)) > 1 or breaks[0] < log_m_steps.shape[0], breaks
    np.testing.assert_allclose(np.asarray(dyn_m), expected, atol=1e-6)


def test_autoreg_prior_truncation_equals_masking():
    """The LSTM prior is causal: prior params for the first t slots of a
    K-slot rollout equal the prior params of the t-slot truncation —
    the ground for zeroing dead-slot KL instead of dropping slots."""
    from genesis_tpu.ops import losses as L

    K, B, D = 6, 2, 8
    rs = np.random.RandomState(0)
    mu = jnp.asarray(rs.randn(K, B, D).astype(np.float32))
    sigma = jnp.asarray(0.5 + rs.rand(K, B, D).astype(np.float32))
    z = jnp.asarray(rs.randn(K, B, D).astype(np.float32))

    prior = L.AutoregPrior(ldim=D, hidden=16)
    variables = prior.init(jax.random.PRNGKey(0), z[:-1],
                           method=prior.prior_params)

    def kl(mu_, sigma_, z_):
        bound = prior.bind(variables)
        out, _, _ = L.mask_latent_loss(mu_, sigma_, z_, prior=bound)
        return np.asarray(out)

    full = kl(mu, sigma, z)
    for t in (2, 4):
        trunc = kl(mu[:t], sigma[:t], z[:t])
        np.testing.assert_allclose(full[:t], trunc, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def dyn_model_out():
    from genesis_tpu.models import genesisv2_config
    cfg = AttrDict(
        K_steps=5, img_size=32, feat_dim=16, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, compute_dtype="float32",
        pallas_icsbp=False, dynamic_K=True, dynamic_K_threshold=120.0,
        klm_loss=True)
    model = genesisv2_config.load(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3))
    key = jax.random.PRNGKey(1)
    variables = model.init({"params": key, "sample": key}, x, True)
    out = model.apply(variables, x, True,
                      rngs={"sample": jax.random.PRNGKey(5)})
    return out


def test_dynamic_k_model_losses_drop_dead_slots(dyn_model_out):
    recon, losses, stats, att_stats, comp_stats = dyn_model_out
    log_m_k = np.asarray(stats["log_m_k"])          # [K,B,H,W,1]
    live = (log_m_k > 0.5 * LOG_ZERO).any(axis=(2, 3, 4))  # [K,B]
    assert (~live).any(), "no dead slots — lower the test threshold"
    assert live.any(axis=0).all(), "every element needs >=1 live slot"

    kl = np.asarray(losses["kl_l_k"])               # [K,B]
    assert np.all(kl[~live] == 0.0), "dead slots must carry zero KL"
    assert np.all(np.isfinite(kl))
    assert np.abs(kl[live]).sum() > 0

    # Decode softmax renormalises over live slots only: dead recon-mask
    # mass ~0, live mass sums to 1 (the reference's truncated softmax).
    m_r = np.exp(np.asarray(stats["log_m_r_k"]))    # [K,B,H,W,1]
    dead_mass = m_r[~live].sum()
    assert dead_mass < 1e-6, dead_mass
    np.testing.assert_allclose(m_r.sum(axis=0), 1.0, atol=1e-3)

    # err must equal the x_loss restricted to live slots (dead slots
    # contribute nothing to the mixture).
    assert np.all(np.isfinite(np.asarray(losses["err"])))
    assert np.all(np.isfinite(np.asarray(losses["kl_m"])))
