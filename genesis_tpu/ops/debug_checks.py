"""Per-forward debug invariants (jit-safe).

The reference asserts inside every forward under `self.debug or not
self.training`: slot masks sum to one (utils/misc.py:258-270, called from
genesis_config.py:269, genesisv2_config.py:191-196, monet_config.py:121-126)
and the IC-SBP kernel alpha stays in its clamped range
(modules/attention.py:207-210). Python asserts cannot see traced values, so
each invariant reduces to scalars ON DEVICE (max deviation / NaN flag — no
full-tensor device-to-host copy) and raises on the host via
`jax.debug.callback`. With `debug=False` and `train=True` the checks
disappear entirely at trace time, so the hot path is untouched.
"""

import jax
import jax.numpy as jnp


def _callbacks_supported() -> bool:
    """The axon PJRT plugin (single-chip TPU tunnel) implements no host
    send/recv, so jax.debug.callback programs fail to compile there.
    Checks become no-ops on that backend; the trainer's loop-level eval
    check (train/loop.py) still covers it from the host side.

    The plugin registers as platform "tpu" (default_backend() == "tpu"),
    so identify it via the client's platform_version string."""
    try:
        client = jax.devices()[0].client
    except Exception:
        return True
    return "axon" not in getattr(client, "platform_version", "")


def _raise_log_masks(max_diff, has_nan, name, tol):
    if bool(has_nan):
        raise ValueError(f"NaN in {name} masks.")
    if float(max_diff) > tol:
        raise ValueError(
            f"Masks {name} do not sum to 1.0 (max diff "
            f"{float(max_diff):.3e} > {tol:g}). Not close enough.")


def check_log_masks(log_m_k, name: str = "log_m_k", tol: float = 1e-3):
    """Invariant: sum_k exp(log_m_k) == 1 +- tol, no NaNs.

    log_m_k: [K, B, H, W, 1]. Reference utils/misc.py:258-270 semantics
    (max positive deviation + NaN detection), reduced to two scalars on
    device before the host callback.
    """
    if not _callbacks_supported():
        return
    summed = jnp.sum(jnp.exp(log_m_k), axis=0)
    max_diff = jnp.max(summed - 1.0)
    has_nan = jnp.any(jnp.isnan(log_m_k))
    jax.debug.callback(_raise_log_masks, max_diff, has_nan, name, tol)


def _raise_alpha(amin, amax, lo, hi):
    if float(amin) < lo or float(amax) > hi:
        raise ValueError(
            f"IC-SBP alpha out of range [{lo}, {hi}]: "
            f"min {float(amin):.6f}, max {float(amax):.6f}.")


def check_alpha_range(alpha, lo: float = 0.0, hi: float = 1.0):
    """Invariant: raw kernel alpha in [0, 1] before the clamp
    (reference modules/attention.py:207-210)."""
    if not _callbacks_supported():
        return
    jax.debug.callback(_raise_alpha, jnp.min(alpha), jnp.max(alpha),
                       lo, hi)
