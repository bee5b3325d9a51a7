"""Worker process for the multi-host (DCN) test.

Spawned by tests/test_multihost.py with the env-var contract that
`parallel.init_distributed` reads (JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID) plus a forced-CPU 4-virtual-device
platform, forming a 2-process x 4-device = 8-device global mesh. Runs
one sharded GENESIS-V2 train step on a deterministic global batch and
writes the resulting loss to OUT_FILE as JSON.

This is the reference's missing multi-node story made real: SURVEY.md
section 2.3 scopes multi-host as `jax.distributed.initialize` over DCN
with XLA collectives doing the communication.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from genesis_tpu.parallel import init_distributed
    assert init_distributed(), "coordinator env vars must be set"

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np
    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.models import genesisv2_config
    from genesis_tpu.parallel import make_mesh
    from genesis_tpu.parallel.mesh import data_sharding, replicated
    from genesis_tpu.train import step as step_lib
    from genesis_tpu.train.state import create_train_state

    cfg = AttrDict(
        K_steps=3, img_size=32, feat_dim=32, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, compute_dtype="float32",
        pallas_icsbp=False, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=8, train_iter=1000,
        seed=0)
    model = genesisv2_config.load(cfg)

    # Deterministic global batch, identical on every process.
    global_batch = np.random.RandomState(0).rand(
        8, 32, 32, 3).astype(np.float32)

    mesh = make_mesh()  # (data=8, model=1) across both processes
    assert mesh.shape["data"] == 8

    # Host state is identical on all processes (same PRNG seed), so the
    # replicated global array can be assembled shard-by-shard locally.
    state = create_train_state(model, cfg, {"input": global_batch},
                               jax.random.PRNGKey(0))

    def globalise(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    repl = replicated(mesh)
    state = jax.tree_util.tree_map(lambda x: globalise(x, repl), state)
    batch = {"input": globalise(global_batch,
                                data_sharding(mesh, ndim=4))}

    train_step = step_lib.jit_train_step(
        step_lib.make_train_step(model, cfg))
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    err = float(np.asarray(metrics["err"]))
    elbo = float(np.asarray(metrics["elbo"]))

    out = {"process": jax.process_index(), "err": err, "elbo": elbo,
           "devices": jax.device_count()}
    with open(os.environ["OUT_FILE"], "w") as f:
        json.dump(out, f)
    print("worker done:", out)


if __name__ == "__main__":
    main()
