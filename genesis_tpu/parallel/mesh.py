"""Mesh + sharding helpers.

Design: a 2-D logical mesh `(data, model)`. Data parallelism shards the
batch over `data`; the `model` axis is reserved for tensor-parallel
sharding rules (the reference's models are ~10^5-10^7 params, so the
default model-axis size is 1, but the trainer is written against the mesh
so TP only requires a different mesh shape + param sharding rules).

Collectives are emitted by XLA from the shardings — there is no user-level
communication code. Multi-host (DCN) initialisation goes through
`jax.distributed.initialize` when a coordinator is configured.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> bool:
    """Initialise multi-host JAX over DCN if a coordinator is configured
    (no-op on single host). Returns True if distributed mode is active."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    return True


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1,
              batch_size: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    The device order is kept as enumerated by JAX, which on TPU follows the
    physical torus order so the `data` all-reduce rides ICI rings.

    When `batch_size` is given and does not divide the data-axis size, the
    data axis is clamped to the largest batch divisor that fits, using a
    device subset — so e.g. a `--debug` run (batch 2) works unchanged on an
    8-chip host instead of failing GSPMD's divisibility check.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    n_data = n // model_parallel
    if batch_size is not None and batch_size % n_data != 0:
        n_data = min(n_data, batch_size)
        while batch_size % n_data:
            n_data -= 1
    grid = np.asarray(
        devices[:n_data * model_parallel]).reshape(n_data, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharding_for_leaf(path_str: str, leaf, mesh: Mesh, rules):
    """Resolve the NamedSharding for one state leaf.

    rules: sequence of (path_regex, PartitionSpec). Key paths are
    normalised to 'a/b/c' form before matching. The first rule whose
    regex matches the leaf's key-path applies, PROVIDED the spec rank
    equals the leaf rank and every sharded dim is divisible by its mesh
    axis size; otherwise the leaf stays replicated. Optimiser moments
    (adam mu/nu) carry the same key paths as their params, so one rule
    set shards params and optimiser state consistently.
    """
    import re
    path_str = re.sub(r"[\[\]'.]+", "/", path_str).strip("/")
    for pattern, spec in rules:
        if not re.search(pattern, path_str):
            continue
        if len(spec) != getattr(leaf, "ndim", 0):
            continue
        ok = True
        for dim, axis in zip(leaf.shape, spec):
            if axis is None:
                continue
            if dim % mesh.shape[axis] != 0:
                ok = False
                break
        if ok:
            return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def shard_tree(tree, mesh: Mesh, rules):
    """device_put every leaf with its rule-resolved sharding (replicated
    when no rule matches). This is the tensor-parallel entry point: with
    kernels sharded over `model`, GSPMD partitions the matmuls/convs and
    inserts the collectives (SURVEY.md section 2.3 TP row)."""
    if not rules:
        repl = replicated(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), tree)

    def put(path, leaf):
        s = sharding_for_leaf(jax.tree_util.keystr(path), leaf, mesh,
                              rules)
        return jax.device_put(leaf, s)

    return jax.tree_util.tree_map_with_path(put, tree)


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with batch-dim sharding."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, ndim=x.ndim))
    return jax.tree_util.tree_map(put, batch)


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """Overlap host->device transfer with compute: keep `size` sharded
    batches in flight ahead of the consumer (flax prefetch_to_device
    pattern, generalised to mesh shardings)."""
    import collections
    queue = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(mesh, batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
