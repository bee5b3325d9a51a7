"""Loss functions: mixture NLL, MC KL divergences, mask KL, priors.

Parity targets:
  * `x_loss`            — reference models/genesis_config.py:273-286, but
    computed with logsumexp (the stability fix the reference itself flags at
    genesis_config.py:280-281).
  * `get_mc_kl`         — reference utils/misc.py:254-255.
  * `mask_latent_loss`  — reference models/genesis_config.py:288-343
    (autoregressive LSTM prior over slot latents, MC KL).
  * `kl_m_loss`         — reference models/monet_config.py:157-170
    (Categorical KL between attention and reconstructed masks).
  * `get_mask_recon_stack` — reference models/monet_config.py:135-155.

All slot-stacked tensors are slot-major [K, B, ...].
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B

_LOG_2PI = math.log(2.0 * math.pi)


def normal_log_prob(x, mean, std):
    """Elementwise log N(x; mean, std^2)."""
    var = std ** 2
    return -0.5 * ((x - mean) ** 2 / var + jnp.log(var) + _LOG_2PI)


def std_normal_log_prob(x):
    return -0.5 * (x ** 2 + _LOG_2PI)


def x_loss(x, log_m_k, x_r_k, std, pixel_wise: bool = False):
    """Mixture-of-Gaussians reconstruction NLL.

    x: [B,H,W,C]; log_m_k: [K,B,H,W,1]; x_r_k: [K,B,H,W,C];
    std: scalar or [K] per-slot pixel std.
    Returns [B] (or [B,H,W,C] if pixel_wise).
    """
    std = jnp.asarray(std, x.dtype)
    if std.ndim == 1:  # per-slot
        std = std.reshape(-1, 1, 1, 1, 1)
    log_xr = normal_log_prob(x[None], x_r_k, std)      # [K,B,H,W,C]
    log_mx = log_m_k + log_xr
    err_ppc = -jax.nn.logsumexp(log_mx, axis=0)        # [B,H,W,C]
    if pixel_wise:
        return err_ppc
    return jnp.sum(err_ppc, axis=(1, 2, 3))


def get_mc_kl(z, q_mu, q_sigma, p_mu, p_sigma):
    """Monte-Carlo KL: log q(z) - log p(z), summed over the latent dim."""
    log_q = normal_log_prob(z, q_mu, q_sigma)
    log_p = normal_log_prob(z, p_mu, p_sigma)
    return jnp.sum(log_q - log_p, axis=-1)


def get_mask_recon_stack(m_r_logits_k, prior_mode: str, log: bool):
    """Combine per-slot mask logits into normalised masks.

    m_r_logits_k: [K,B,H,W,1]. 'softmax' normalises across slots; 'scope'
    runs the stick-breaking recursion on the logits.
    """
    if prior_mode == "softmax":
        out = jax.nn.log_softmax(m_r_logits_k, axis=0)
        return out if log else jnp.exp(out)
    if prior_mode == "scope":
        log_a = jax.nn.log_sigmoid(m_r_logits_k[:-1])
        log_na = jax.nn.log_sigmoid(-m_r_logits_k[:-1])
        zeros = jnp.zeros_like(m_r_logits_k[:1])
        log_s = jnp.concatenate([zeros, jnp.cumsum(log_na, axis=0)], axis=0)
        out = jnp.concatenate([log_s[:-1] + log_a, log_s[-1:]], axis=0)
        return out if log else jnp.exp(out)
    raise ValueError(f"No valid prior mode: {prior_mode}")


def kl_m_loss(log_m_k, log_m_r_k, eps: float = 1e-5):
    """Categorical KL between attention masks q and recon masks p, per
    pixel, summed over pixels -> [B]. Both mask stacks [K,B,H,W,1]."""
    q = jnp.maximum(jnp.exp(log_m_k), eps)
    p = jnp.maximum(jnp.exp(log_m_r_k), eps)
    # Normalise (torch Categorical normalises unnormalised probs).
    q = q / jnp.sum(q, axis=0, keepdims=True)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    kl_ppc = jnp.sum(q * (jnp.log(q) - jnp.log(p)), axis=0)  # [B,H,W,1]
    return jnp.sum(kl_ppc, axis=(1, 2, 3))


class AutoregPrior(nn.Module):
    """Autoregressive LSTM prior p(z_k | z_<k) over slot latents
    (reference models/genesis_config.py:129-132, 288-343).

    `rollout_tanh_mu`: the reference applies tanh to the prior mean in
    the teacher-forced KL path for BOTH models (genesis_config.py:309)
    and in GenesisV2.sample (genesisv2_config.py:241), but Genesis.sample
    uses the RAW linear output as the mean (genesis_config.py:355-357 —
    no tanh). That asymmetry is reproduced here because published FIDs
    depend on the sample path: Genesis sets rollout_tanh_mu=False."""
    ldim: int
    hidden: int = 256
    scan_unroll: int = 0  # 0 = full unroll (see attention._unroll)
    rollout_tanh_mu: bool = True

    def setup(self):
        self.cell = nn.OptimizedLSTMCell(self.hidden)
        self.linear = B.Dense(2 * self.ldim)

    def _unroll(self, steps: int) -> int:
        from genesis_tpu.ops.attention import _unroll
        return _unroll(steps, self.scan_unroll)

    def _step_params(self, lstm_out, tanh_mu: bool = True):
        mu_raw, sigma_raw = jnp.split(self.linear(lstm_out), 2, axis=-1)
        mu = jnp.tanh(mu_raw) if tanh_mu else mu_raw
        return mu, B.to_prior_sigma(sigma_raw)

    def prior_params(self, z_seq):
        """Teacher-forced prior params for steps 1..S given z_seq [S,B,D]
        (the latents for steps 0..S-1). Returns (mu, sigma) [S,B,D].

        Teacher forcing makes only the LSTM recurrence serial — it is
        lowered to nn.scan (one traced cell body for any K, SURVEY.md
        section 7.3); the output head runs batched over all steps.
        """
        bsz = z_seq.shape[1]
        carry0 = (jnp.zeros((bsz, self.hidden), z_seq.dtype),
                  jnp.zeros((bsz, self.hidden), z_seq.dtype))

        def step(mod, carry, z_t):
            carry, y = mod.cell(carry, z_t)
            return carry, y

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False},
                       unroll=self._unroll(z_seq.shape[0]))
        _, outs = scan(self, carry0, z_seq)
        return self._step_params(outs)

    def rollout(self, key, batch_size: int, steps: int):
        """Ancestral sampling: z_1 ~ N(0,1), z_k ~ p(.|z_<k). Returns
        z [steps, B, D]. Serial by construction; nn.scan carries
        (lstm_state, z)."""
        keys = jax.random.split(key, steps)
        z0 = jax.random.normal(keys[0], (batch_size, self.ldim))
        if steps == 1:
            return z0[None]

        def step(mod, carry, step_key):
            lstm_carry, z_prev = carry
            lstm_carry, y = mod.cell(lstm_carry, z_prev)
            mu, sigma = mod._step_params(y, tanh_mu=mod.rollout_tanh_mu)
            z_t = mu + sigma * jax.random.normal(step_key, mu.shape)
            return (lstm_carry, z_t), z_t

        carry0 = ((jnp.zeros((batch_size, self.hidden), z0.dtype),
                   jnp.zeros((batch_size, self.hidden), z0.dtype)), z0)
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False},
                       unroll=self._unroll(steps - 1))
        _, z_rest = scan(self, carry0, keys[1:])
        return jnp.concatenate([z0[None], z_rest], axis=0)


def mask_latent_loss(q_mu_k, q_sigma_k, z_0_k, z_k_k=None,
                     prior: Optional[AutoregPrior] = None):
    """MC KL between slot-latent posteriors and the (optionally
    autoregressive) prior.

    q_mu_k, q_sigma_k, z_0_k: [K,B,D]. Returns (kl [K,B], p_mu [K,B,D],
    p_sigma [K,B,D]). Step 0 prior is N(0,1); steps k>0 use the LSTM prior
    conditioned on z_{<k} when `prior` is given.
    """
    if z_k_k is None:
        z_k_k = z_0_k
    K = z_0_k.shape[0]
    if prior is not None and K > 1:
        mu_later, sigma_later = prior.prior_params(z_k_k[:-1])
        p_mu = jnp.concatenate([jnp.zeros_like(mu_later[:1]), mu_later])
        p_sigma = jnp.concatenate(
            [jnp.ones_like(sigma_later[:1]), sigma_later])
    else:
        p_mu = jnp.zeros_like(z_0_k)
        p_sigma = jnp.ones_like(z_0_k)
    log_q = jnp.sum(normal_log_prob(z_0_k, q_mu_k, q_sigma_k), axis=-1)
    log_p = jnp.sum(normal_log_prob(z_k_k, p_mu, p_sigma), axis=-1)
    return log_q - log_p, p_mu, p_sigma
