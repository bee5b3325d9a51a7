"""Stick-breaking attention processes.

TPU re-design of reference modules/attention.py:25-226. Key differences from
the torch version (same math, better mapping to XLA):

  * The SBP scope recursion `log s_k = log s_{k-1} + log(1-a_k)` is a prefix
    sum in log space — where all attention logits are available at once
    (SimpleSBP decode side, LatentSBP) it is computed with one `cumsum`
    instead of a serial loop (`sbp_rollout`).
  * IC-SBP seed selection (attention.py:189-192 loops over batch items) is
    vectorised with argmax + take_along_axis over the whole batch.
  * `dynamic_K` early termination (attention.py:218-219) is re-expressed
    with static shapes: all steps are computed, the break step is found per
    batch element, and later slots are masked to -1e10 — batch-parallel,
    unlike the reference which requires batch_size 1 per element.

Slot-stacked returns are [K, B, H, W, 1] (slot-major).
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B
from genesis_tpu.ops.blocks import upcast_f32
from genesis_tpu.ops.gc_vae import GatedConvVAE

LOG_ZERO = -1e10


def sbp_rollout(a_logits_k):
    """Vectorised stick-breaking from per-step attention logits.

    a_logits_k: [S, B, H, W, 1] -> (log_m [S+1,...], log_s [S+1,...])
    log_s[k] is the scope *before* step k (log_s[0] = 0); the final mask is
    the leftover scope (reference attention.py:50).
    """
    a_logits_k = upcast_f32(a_logits_k)
    log_a = jax.nn.log_sigmoid(a_logits_k)
    log_na = jax.nn.log_sigmoid(-a_logits_k)
    zeros = jnp.zeros_like(log_a[:1])
    log_s = jnp.concatenate([zeros, jnp.cumsum(log_na, axis=0)], axis=0)
    log_m = jnp.concatenate([log_s[:-1] + log_a, log_s[-1:]], axis=0)
    return log_m, log_s


class SimpleSBP(nn.Module):
    """Recursive scope attention with a UNet core (attention.py:25-74).

    The forward pass is inherently serial (the core sees the current scope),
    so the step loop is lowered to `nn.scan` with broadcast core params —
    the UNet body is traced and compiled once regardless of K.
    """
    core: nn.Module

    def __call__(self, x, steps_to_run: int, train: bool = True):
        def step(core, log_s, _):
            core_out, _ = core(
                jnp.concatenate([x, log_s.astype(x.dtype)], axis=-1),
                train)
            # SBP log-space recursion stays f32 even under bf16 compute.
            a_logits = upcast_f32(core_out[..., :1])
            log_m = log_s + jax.nn.log_sigmoid(a_logits)
            new_s = log_s + jax.nn.log_sigmoid(-a_logits)
            return new_s, (log_m, new_s)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, length=steps_to_run)
        log_s0 = jnp.zeros_like(x[..., :1])
        final_s, (log_m_steps, log_s_steps) = scan(self.core, log_s0, None)
        log_m = jnp.concatenate([log_m_steps, final_s[None]], axis=0)
        log_s = jnp.concatenate([log_s0[None], log_s_steps], axis=0)
        return log_m, log_s, {}

    def masks_from_zm_k(self, zm_k, train: bool = False):
        """Decode-side masks for sampling (attention.py:53-74).

        zm_k: [K, B, ldim] -> (log_m [K+1,...], log_s [K+1,...], other
        channels [K, B, H, W, rest]).
        """
        K, bsz = zm_k.shape[0], zm_k.shape[1]
        z_flat = zm_k.reshape(K * bsz, -1)
        core_out = self.core.decode(z_flat, train)
        core_out = core_out.reshape((K, bsz) + core_out.shape[1:])
        a_logits = core_out[..., :1]
        log_m, log_s = sbp_rollout(a_logits)
        return log_m, log_s, core_out[..., 1:]


def _unroll(steps: int, unroll) -> int:
    """Scan unroll policy. The serial K-loops are lowered to nn.scan so
    the body is traced ONCE (fast tracing on a 1-core host) — but a
    device-side loop of small per-slot ops costs step time on TPU
    (measured +40% on the V2 train step at 64px/K9), so by default the
    scan is fully unrolled at the HLO level: single trace, zero loop
    overhead. Pass unroll=1 (or a divisor of K) to trade step time for
    XLA compile time at large K/resolution."""
    return steps if unroll in (0, None) else min(unroll, steps)


class LatentSBP(nn.Module):
    """Latent stick-breaking: LSTM over mask latents conditioned on encoder
    features, batched parallel decode (attention.py:77-133)."""
    core: GatedConvVAE
    scan_unroll: int = 0  # 0 = full unroll (see _unroll)

    def setup(self):
        z = self.core.z_size
        self.lstm = nn.OptimizedLSTMCell(2 * z)
        self.linear = B.Dense(2 * z)

    def __call__(self, x, steps_to_run: int, train: bool = True):
        bsz = x.shape[0]
        z_size = self.core.z_size
        h = self.core.encode_features(x, train)
        mean, var = self.core.posterior(h)
        key = self.make_rng("sample")
        keys = jax.random.split(key, steps_to_run)
        z, sigma = self.core.reparameterize(mean, var, keys[0])

        # The z_{k-1} -> z_k recurrence is serial by construction
        # (reference attention.py:94-103); lower it to nn.scan carrying
        # (lstm_state, z) with broadcast params so the LSTM body compiles
        # once regardless of K (SURVEY.md section 7.3).
        def step(mod, carry, step_key):
            lstm_carry, z_prev = carry
            lstm_in = jnp.concatenate([h, z_prev], axis=-1)
            lstm_carry, lstm_out = mod.lstm(lstm_carry, lstm_in)
            mean_k, var_ps = jnp.split(mod.linear(lstm_out), 2, axis=-1)
            var_k = B.to_var(var_ps)
            z_k, sigma_k = mod.core.reparameterize(mean_k, var_k, step_key)
            return (lstm_carry, z_k), (z_k, mean_k, sigma_k)

        if steps_to_run > 1:
            carry0 = ((jnp.zeros((bsz, 2 * z_size), h.dtype),
                       jnp.zeros((bsz, 2 * z_size), h.dtype)),
                      z.astype(h.dtype))
            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False},
                           unroll=_unroll(steps_to_run - 1,
                                          self.scan_unroll))
            _, (z_rest, mu_rest, sigma_rest) = scan(self, carry0, keys[1:])
            z_all = jnp.concatenate([z[None], z_rest], axis=0)  # [S, B, z]
            mu_k = jnp.concatenate([mean[None], mu_rest], axis=0)
            sigma_k = jnp.concatenate([sigma[None], sigma_rest], axis=0)
        else:
            z_all = z[None]
            mu_k = mean[None]
            sigma_k = sigma[None]
        # Parallel decode with S folded into batch.
        out = self.core.decode(z_all.reshape(steps_to_run * bsz, -1), train)
        out = out.reshape((steps_to_run, bsz) + out.shape[1:])
        log_m, log_s = sbp_rollout(out[..., :1])
        stats = {
            "x_k": out,
            "mu_k": mu_k,
            "sigma_k": sigma_k,
            "z_k": z_all,
        }
        return log_m, log_s, stats

    def masks_from_zm_k(self, zm_k, train: bool = False):
        K, bsz = zm_k.shape[0], zm_k.shape[1]
        out = self.core.decode(zm_k.reshape(K * bsz, -1), train)
        out = out.reshape((K, bsz) + out.shape[1:])
        log_m, log_s = sbp_rollout(out[..., :1])
        return log_m, log_s, out[..., 1:]


def _kernel_sigma_init(kernel: str, K_steps: int) -> float:
    if kernel == "laplacian":
        return 1.0 / (math.sqrt(K_steps) * math.log(2.0))
    if kernel == "gaussian":
        return 1.0 / (K_steps * math.log(2.0))
    if kernel == "epanechnikov":
        return 2.0 / K_steps
    raise ValueError(f"No valid kernel: {kernel}")


class InstanceColouringSBP(nn.Module):
    """IC-SBP kernel-attention clustering (attention.py:136-226).

    With `use_pallas` (default) and a lane-aligned, VMEM-fitting shape,
    the K-step rollout runs as one fused Pallas kernel
    (ops/pallas/ic_sbp.py) with a fixed-seed K-parallel VJP; gradients
    are identical. Measured on v5e (full V2 train step, b32): +2.7%
    throughput at 64px/K9 (11.50 vs 11.81 ms/step). Above 64px the
    (S+1)-deep VMEM blocks exceed budget, so a step-grid variant streams
    each step's rows to HBM (extends the kernel to 128px); above that
    `supported()` routes to the stock XLA path. Engages on the TPU
    backend only — interpret mode is for the direct kernel-parity
    tests, not the model path.
    """
    img_size: int
    kernel: str = "gaussian"
    colour_dim: int = 8
    K_steps: Optional[int] = None
    feat_dim: Optional[int] = None
    semiconv: bool = True
    dynamic_K_threshold: float = 20.0
    use_pallas: bool = True
    scan_unroll: int = 0  # 0 = full unroll (see _unroll)
    debug: bool = False  # per-forward alpha-range invariant

    def setup(self):
        sigma_init = _kernel_sigma_init(self.kernel, self.K_steps)
        self.log_sigma = self.param(
            "log_sigma",
            lambda key: jnp.asarray(math.log(sigma_init), jnp.float32))
        if self.semiconv:
            self.colour_head = B.SemiConv(self.colour_dim, self.img_size)
        else:
            self.colour_head = B.Conv(self.colour_dim, 1)

    def _alpha(self, colour, seed):
        """Kernel response between colour field and per-batch seed.

        colour: [B,H,W,D]; seed: [B,D] -> alpha [B,H,W,1] in [0,1].
        """
        seed = seed[:, None, None, :]
        sigma = jnp.exp(self.log_sigma)
        if self.kernel == "laplacian":
            dist = B.euclidian_distance(colour, seed)
            alpha = jnp.exp(-dist / sigma)
        elif self.kernel == "gaussian":
            dist = B.squared_distance(colour, seed)
            alpha = jnp.exp(-dist / sigma)
        elif self.kernel == "epanechnikov":
            dist = B.squared_distance(colour, seed)
            alpha = nn.relu(1.0 - dist / sigma)
        else:
            raise ValueError(f"No valid kernel: {self.kernel}")
        return alpha[..., None]

    def __call__(self, features, steps_to_run: int, train: bool = True,
                 dynamic_K: bool = False):
        bsz = features.shape[0]
        out = self.colour_head(features)
        if isinstance(out, tuple):
            colour, delta = out
        else:
            colour, delta = out, None
        ch, cw = colour.shape[1], colour.shape[2]

        # One uniform field sampled up front, reused across steps
        # (reference attention.py:177-178).
        key = self.make_rng("sample")
        rand_pixel = jax.random.uniform(key, (bsz, ch, cw, 1), colour.dtype)

        same_res = (ch, cw) == (self.img_size, self.img_size)
        from genesis_tpu.ops.pallas import ic_sbp as icp
        on_tpu = jax.default_backend() == "tpu"
        # Debug routes through the XLA path so the per-step alpha
        # invariant is materialised and checkable.
        if (self.use_pallas and not self.debug and on_tpu and same_res
                and icp.supported(self.img_size, steps_to_run,
                                  self.colour_dim)):
            log_m_full_, log_s_, seeds_ = icp.ic_sbp_rollout(
                upcast_f32(colour), rand_pixel[..., 0],
                self.log_sigma, steps_to_run, self.kernel)
            log_m = log_m_full_[:-1][..., None]   # [S, B, H, W, 1]
            log_s_all = log_s_[..., None]         # [S+1, B, H, W, 1]
            seeds = seeds_
        else:
            # The SBP update adds log(alpha) (at the colour-field
            # resolution) onto the scope, so the two must match. The
            # reference has the same implicit constraint (attention.py:
            # 185-217 only ever runs with colour at img_size).
            assert same_res, (
                f"IC-SBP requires the colour field resolution "
                f"{(ch, cw)} to equal img_size {self.img_size}")
            colour_flat = colour.reshape(bsz, ch * cw, self.colour_dim)
            log_s0 = jnp.zeros((bsz, self.img_size, self.img_size, 1),
                               colour.dtype)

            # Serial SBP rollout as nn.scan (one traced body for any K;
            # SURVEY.md section 7.3). Carry = scope; the kernel width
            # param log_sigma is broadcast.
            def sbp_step(mod, log_s, _):
                scope = jnp.exp(log_s)
                pixel_probs = (rand_pixel * scope).reshape(bsz, ch * cw)
                rand_max = jnp.argmax(pixel_probs, axis=1)       # [B]
                seed = jnp.take_along_axis(
                    colour_flat, rand_max[:, None, None],
                    axis=1)[:, 0]                                # [B,D]
                alpha = mod._alpha(colour, seed)
                if mod.debug:
                    # Raw kernel response must sit in [0, 1] before the
                    # clamp (reference attention.py:207-210).
                    from genesis_tpu.ops import debug_checks
                    debug_checks.check_alpha_range(alpha)
                # Clamp to [0.01, 0.99] for numerical stability,
                # straight-through grads (attention.py:211-213).
                alpha = B.clamp_preserve_gradients(alpha, 0.01, 0.99)
                log_m_step = log_s + jnp.log(alpha)
                new_s = log_s + jnp.log1p(-alpha)
                return new_s, (log_m_step, new_s, seed)

            scan = nn.scan(sbp_step, variable_broadcast="params",
                           split_rngs={"params": False},
                           length=steps_to_run,
                           unroll=_unroll(steps_to_run,
                                          self.scan_unroll))
            _, (log_m, log_s_steps, seeds) = scan(self, log_s0, None)
            # log_m: [S, B, H, W, 1]; prepend the initial scope.
            log_s_all = jnp.concatenate([log_s0[None], log_s_steps],
                                        axis=0)  # [S+1, B, H, W, 1]
        mask_mass = jnp.sum(jnp.exp(log_m), axis=(2, 3, 4))  # [S, B]

        if dynamic_K:
            # break_at[b] = first step whose mask mass < threshold (S if
            # none). Slot k keeps m_k for k < break_at, gets the scope at
            # break_at, and -1e10 after — static-shape equivalent of the
            # reference's per-element break + padding
            # (genesisv2_config.py:118-137).
            below = mask_mass < self.dynamic_K_threshold        # [S, B]
            break_at = jnp.where(
                jnp.any(below, axis=0),
                jnp.argmax(below, axis=0),
                jnp.full((bsz,), steps_to_run))                 # [B]
            k_idx = jnp.arange(steps_to_run + 1)
            keep = k_idx[:, None] < break_at[None, :]           # [S+1, B]
            is_scope = k_idx[:, None] == break_at[None, :]
            scope_at_break = jnp.take_along_axis(
                log_s_all, break_at[None, :, None, None, None], axis=0)
            log_m_padded = jnp.concatenate(
                [log_m, jnp.full_like(log_m[:1], LOG_ZERO)], axis=0)
            sel = keep[:, :, None, None, None]
            sel_scope = is_scope[:, :, None, None, None]
            log_m_full = jnp.where(
                sel, log_m_padded,
                jnp.where(sel_scope,
                          jnp.broadcast_to(scope_at_break,
                                           log_m_padded.shape),
                          LOG_ZERO))
        else:
            log_m_full = jnp.concatenate([log_m, log_s_all[-1:]], axis=0)

        stats = {"colour": colour, "delta": delta,
                 "seeds": jnp.asarray(seeds)}
        return log_m_full, log_s_all, stats
