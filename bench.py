#!/usr/bin/env python
"""Benchmark: GENESIS-V2 training throughput (the BASELINE.json north-star
metric — images/sec on the ShapeStacks training config: 64x64, K_steps=9,
batch 32, GECO + Adam, full train step incl. backward + optimiser).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "im/s", "vs_baseline": N}

vs_baseline normalises against the reference implementation's measured
GPU throughput. The reference publishes no wall-clock numbers
(BASELINE.md); REFERENCE_IM_S below is our estimate of the reference's
~100 im/s on its CUDA-10.1-era GPU for this config (PyTorch 1.3,
batch 32). The north-star target is >= 5x that.
"""

import json
import os
import time

import numpy as np

REFERENCE_IM_S = 100.0  # estimated reference GPU throughput (see above)


def main():
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax

    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.models import genesisv2_config
    from genesis_tpu.parallel import make_mesh, shard_batch
    from genesis_tpu.train import step as step_lib
    from genesis_tpu.train.state import create_train_state

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    img_size = int(os.environ.get("BENCH_IMG", "64"))
    k_steps = int(os.environ.get("BENCH_K", "9"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))

    cfg = AttrDict(
        K_steps=k_steps, img_size=img_size, feat_dim=64, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, montecarlo_kl=True,
        comp_ldim=16, comp_enc_channels=32, comp_dec_channels=32,
        comp_dec_layers=4, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=batch_size,
        train_iter=500000, seed=0)

    model = genesisv2_config.load(cfg)
    rs = np.random.RandomState(0)
    batch = {"input": rs.rand(batch_size, img_size, img_size, 3)
             .astype(np.float32)}

    mesh = make_mesh()
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    state = step_lib.replicate_state(state, mesh)
    train_step = step_lib.jit_train_step(
        step_lib.make_train_step(model, cfg))
    device_batch = shard_batch(mesh, batch)

    # Compile + warmup
    for _ in range(3):
        state, metrics = train_step(state, device_batch)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, device_batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    im_s = batch_size * steps / dt
    # The reference estimate is for the canonical 64px/K9/b32 config;
    # comparing other configs against it would overstate the speedup.
    canonical = (batch_size, img_size, k_steps) == (32, 64, 9)
    print(json.dumps({
        "metric": f"genesisv2_train_throughput_{img_size}px_"
                  f"K{k_steps}_b{batch_size}",
        "value": round(im_s, 2),
        "unit": "im/s",
        "vs_baseline": round(im_s / REFERENCE_IM_S, 3) if canonical
        else None,
    }))


if __name__ == "__main__":
    main()
