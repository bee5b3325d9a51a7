"""Device-mesh construction and sharding policy.

The reference's only parallelism is single-host nn.DataParallel
(reference train.py:153-155). The TPU-native equivalent is GSPMD: one jit
over a `jax.sharding.Mesh`, batches sharded on the `data` axis, parameters
replicated (with a `model` axis reserved for tensor parallelism), and XLA
emitting the gradient `psum` over ICI.
"""

from genesis_tpu.parallel.mesh import (
    make_mesh, replicated, data_sharding, shard_batch, shard_tree,
    init_distributed)

__all__ = ["make_mesh", "replicated", "data_sharding", "shard_batch",
           "shard_tree", "init_distributed"]
