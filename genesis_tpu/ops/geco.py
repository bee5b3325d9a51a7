"""GECO constrained optimisation as a pure in-jit state update.

Same update law as reference utils/geco.py:17-51, re-expressed functionally
so it lives inside the jitted, donated train step (no host sync):

  loss     = err + beta * kld
  err_ema  = err on the first step, else (1-alpha)*err + alpha*err_ema
  beta    *= exp(lr_eff * (goal - err_ema)),
             lr_eff = speedup*lr when the constraint is positive
  beta     clamped to [beta_min, beta_max]

State is a flat dict of f32 scalars that is checkpointed alongside params
(reference train.py:199-204 restores beta/err_ema).
"""

from typing import Dict, Tuple

import jax.numpy as jnp

GecoState = Dict[str, jnp.ndarray]


def init(goal: float, step_size: float, alpha: float = 0.99,
         beta_init: float = 1.0, beta_min: float = 1e-10,
         beta_max: float = 1e10, speedup: float = None) -> GecoState:
    return {
        "beta": jnp.asarray(beta_init, jnp.float32),
        "err_ema": jnp.asarray(0.0, jnp.float32),
        "ema_initialised": jnp.asarray(False),
        "goal": jnp.asarray(goal, jnp.float32),
        "step_size": jnp.asarray(step_size, jnp.float32),
        "alpha": jnp.asarray(alpha, jnp.float32),
        "beta_min": jnp.asarray(beta_min, jnp.float32),
        "beta_max": jnp.asarray(beta_max, jnp.float32),
        "speedup": jnp.asarray(
            speedup if speedup is not None else 1.0, jnp.float32),
        "use_speedup": jnp.asarray(speedup is not None),
    }


def loss(state: GecoState, err, kld) -> Tuple[jnp.ndarray, GecoState]:
    """Returns (loss, new_state). `err`/`kld` are scalars (batch means)."""
    out = err + state["beta"] * kld
    err_ng = jnp.asarray(err, jnp.float32)
    ema = jnp.where(state["ema_initialised"],
                    (1.0 - state["alpha"]) * err_ng +
                    state["alpha"] * state["err_ema"],
                    err_ng)
    constraint = state["goal"] - ema
    lr_eff = jnp.where(state["use_speedup"] & (constraint > 0),
                       state["speedup"] * state["step_size"],
                       state["step_size"])
    beta = state["beta"] * jnp.exp(lr_eff * constraint)
    beta = jnp.clip(beta, state["beta_min"], state["beta_max"])
    new_state = dict(state)
    new_state["err_ema"] = ema
    new_state["ema_initialised"] = jnp.asarray(True)
    new_state["beta"] = beta
    return out, new_state
