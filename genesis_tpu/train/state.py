"""Train state pytree and optimiser construction.

Checkpoint contract mirrors the reference's torch.save dict (train.py:
410-420): params (+batch_stats), optimiser state, GECO beta/err_ema, and
the step counter all live in one pytree that is donated through the jitted
step and checkpointed as a unit.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from genesis_tpu.ops import geco as geco_lib


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    geco: Any                      # GECO state dict or None
    rng: jax.Array


def make_optimiser(name: str, learning_rate: float) -> optax.GradientTransformation:
    """Optimisers with torch-default hyperparameters
    (reference train.py:171-177)."""
    if name == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate, decay=0.99, eps=1e-8)
    if name == "sgd":
        return optax.sgd(learning_rate, momentum=0.9)
    raise ValueError(f"Unknown optimiser: {name}")


def make_geco_state(cfg, num_elements: int):
    """GECO state from config: goal is per pixel & channel, step size is
    resolution-scaled (reference train.py:159-167)."""
    goal = cfg.g_goal * num_elements
    step_size = cfg.g_lr * (64 ** 2 / cfg.img_size ** 2)
    return geco_lib.init(goal, step_size, cfg.g_alpha, cfg.g_init,
                         cfg.g_min, speedup=cfg.g_speedup)


def create_train_state(model, cfg, example_batch, rng,
                       num_elements: Optional[int] = None) -> TrainState:
    init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
    # Jit the init: one compile, persisted in the XLA compilation cache
    # across processes (eager init costs minutes on slow hosts).
    from genesis_tpu.data.loader import prepare_input
    init_fn = jax.jit(lambda rngs, x: model.init(rngs, x, True))
    variables = init_fn({"params": init_rng, "sample": sample_rng},
                        prepare_input(jnp.asarray(
                            example_batch["input"])))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimiser(cfg.optimiser, cfg.learning_rate)
    opt_state = tx.init(params)
    geco_state = None
    if cfg.get("geco", True):
        if num_elements is None:
            num_elements = int(jnp.prod(
                jnp.asarray(example_batch["input"].shape[1:])))
        geco_state = make_geco_state(cfg, num_elements)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        geco=geco_state,
        rng=state_rng)
