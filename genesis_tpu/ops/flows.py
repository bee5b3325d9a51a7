"""Planar normalising flows for the baseline VAE.

The reference's BaselineVAE carries a normalising-flow KL branch
(models/vae_config.py:80-86: `kl = q_z0.log_prob(z_0) - p_z.log_prob(z_k)
- ldj`) that is dead code there — the vendored sylvester base VAE
(third_party/sylvester/VAE.py) builds no flow layers, so the branch never
runs. This module makes the branch live: amortised planar flows in the
style of the sylvester repo's PlanarVAE (Rezende & Mohamed 2015,
van den Berg et al. 2018), producing exactly the `z_0 / z_k / ldj` stats
the reference KL law consumes.

Each flow step: z' = z + u_hat * tanh(w.z + b), with u_hat the
invertibility-corrected direction, and
log|det dz'/dz| = log|1 + u_hat . psi(z)| where
psi(z) = (1 - tanh^2(w.z + b)) * w.

Flow parameters (u, w, b) are amortised from the encoder feature via a
single Dense head, as in the sylvester amortised-flow VAEs.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B


def planar_step(z: jnp.ndarray, u: jnp.ndarray, w: jnp.ndarray,
                b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One planar-flow transform on a batch of latents.

    Args:
      z: [B, D] latents.
      u, w: [B, D] per-item flow parameters (amortised).
      b: [B] or [B, 1] bias.
    Returns:
      (z', ldj): transformed latents [B, D] and log|det J| [B].
    """
    b = b.reshape(b.shape[0], -1)[:, :1]  # [B, 1]
    wu = jnp.sum(w * u, axis=-1, keepdims=True)  # [B, 1]
    # Invertibility correction: m(x) = -1 + softplus(x) >= -1 ensures
    # w.u_hat >= -1 (Rezende & Mohamed 2015, appendix).
    m_wu = -1.0 + jax.nn.softplus(wu)
    w_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    u_hat = u + (m_wu - wu) * w / jnp.maximum(w_sq, 1e-8)
    a = jnp.tanh(jnp.sum(w * z, axis=-1, keepdims=True) + b)  # [B, 1]
    z_new = z + u_hat * a
    psi = (1.0 - a ** 2) * w  # [B, D]
    det = 1.0 + jnp.sum(u_hat * psi, axis=-1)  # [B]
    # det > 0 is guaranteed by the u_hat correction; floor (not abs) so a
    # regression there blows up training visibly instead of silently
    # computing a wrong density from |det|.
    ldj = jnp.log(jnp.maximum(det, 1e-8))
    return z_new, ldj


class AmortisedPlanarFlow(nn.Module):
    """num_flows planar steps with parameters amortised from a feature.

    __call__(h, z0) -> (z_k, ldj): h is the encoder feature [B, F],
    z0 the reparameterised base sample [B, D]; ldj is the summed
    log-determinant over all steps [B].
    """
    z_size: int
    num_flows: int

    @nn.compact
    def __call__(self, h: jnp.ndarray,
                 z0: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_flows == 0:
            return z0, jnp.zeros(z0.shape[0], z0.dtype)
        d = self.z_size
        params = B.Dense(self.num_flows * (2 * d + 1),
                         name="flow_params")(h)
        params = params.reshape(h.shape[0], self.num_flows, 2 * d + 1)
        z, ldj = z0, jnp.zeros(z0.shape[0], z0.dtype)
        # num_flows is a small static constant (<=16): unrolled python
        # loop traces once and XLA fuses the elementwise chain.
        for k in range(self.num_flows):
            u = params[:, k, :d]
            w = params[:, k, d:2 * d]
            b = params[:, k, 2 * d]
            z, step_ldj = planar_step(z, u, w, b)
            ldj = ldj + step_ldj
        return z, ldj
