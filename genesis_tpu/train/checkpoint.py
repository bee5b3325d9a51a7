"""Checkpointing of the full train state.

Checkpoint keys follow the reference contract (train.py:410-420): model
params(+batch_stats), optimiser state, GECO beta/err_ema, iteration index —
one pytree serialised with flax msgpack into a single `model.ckpt-<suffix>`
file in the run dir (plus flags.json saved by
core.experiment.init_checkpoint for config round-tripping).

Single-file msgpack is deliberate: these models are 10^5-10^7 params, so a
synchronous, atomic (.tmp + rename) write beats an async sharded
checkpointer in both robustness and latency. Multi-host runs write from
process 0 only (state is fully replicated).
"""

import os

import jax
import numpy as np
from flax import serialization

from genesis_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState,
                    verbose: bool = True) -> None:
    from genesis_tpu.core.experiment import fprint
    if jax.process_index() != 0:
        return
    if verbose:
        fprint(f"Saving model training checkpoint to: {path}")
    host_state = jax.tree_util.tree_map(np.asarray, state)
    data = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (a freshly initialised
    state provides shapes/dtypes, like torch load_state_dict)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
