#!/usr/bin/env python
"""Benchmark: GENESIS-V2 training throughput (the BASELINE.json north-star
metric — images/sec on the ShapeStacks training config: 64x64, K_steps=9,
batch 32, GECO + Adam, full train step incl. backward + optimiser).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "im/s", "vs_baseline": N,
   "flops_per_step": N, "achieved_tflops": N, "mfu": N, ...}

vs_baseline: the reference publishes no wall-clock numbers (BASELINE.md),
so it normalises against an ESTIMATED ~100 im/s for the reference's
PyTorch-1.3/CUDA-10.1-era GPU on this config — an estimate, not a
measurement ("baseline_estimated": true marks this). The absolute anchor
is MFU: achieved FLOP/s (XLA cost analysis of the compiled step) over the
chip's bf16 peak.

Env knobs: BENCH_BATCH/BENCH_IMG/BENCH_K/BENCH_STEPS, or
BENCH_CONFIG=clevr for the 128px/K11 CLEVR-shaped config.
"""

import json
import os
import time

import numpy as np

REFERENCE_IM_S = 100.0  # estimated reference GPU throughput (see above)

# bf16 peak FLOP/s per chip, by device_kind substring.
_PEAK_FLOPS = (
    ("v6", 918e12),       # Trillium
    ("v5p", 459e12),
    ("v5", 197e12),       # v5e / "TPU v5 lite"
    ("v4", 275e12),
)


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in _PEAK_FLOPS:
        if tag in kind:
            return peak
    return None


def main():
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax

    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.models import genesisv2_config
    from genesis_tpu.parallel import make_mesh, shard_batch
    from genesis_tpu.train import step as step_lib
    from genesis_tpu.train.state import create_train_state

    preset = os.environ.get("BENCH_CONFIG", "")
    if preset == "clevr":  # CLEVR-shaped: 128px, K=11 (BASELINE.md)
        defaults = dict(batch=32, img=128, k=11)
    else:
        defaults = dict(batch=32, img=64, k=9)
    batch_size = int(os.environ.get("BENCH_BATCH", defaults["batch"]))
    img_size = int(os.environ.get("BENCH_IMG", defaults["img"]))
    k_steps = int(os.environ.get("BENCH_K", defaults["k"]))
    steps = int(os.environ.get("BENCH_STEPS", "50"))

    cfg = AttrDict(
        K_steps=k_steps, img_size=img_size, feat_dim=64, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, montecarlo_kl=True,
        comp_ldim=16, comp_enc_channels=32, comp_dec_channels=32,
        comp_dec_layers=4, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=batch_size,
        train_iter=500000, seed=0)
    if os.environ.get("BENCH_PALLAS_GN"):
        cfg.pallas_gn = (os.environ["BENCH_PALLAS_GN"].strip().lower()
                         not in ("0", "false", "no", ""))
    if os.environ.get("BENCH_SLOT_DTYPE"):  # A/B: bf16 slot storage
        cfg.slot_dtype = os.environ["BENCH_SLOT_DTYPE"].strip()

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

    # XLA's FLOP count for the whole compiled step (fwd+bwd+opt+GECO).
    flops = None
    try:
        lowered = train_step.lower(state, device_batch)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

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
    steps_s = steps / dt
    # The reference estimate is for the canonical 64px/K9/b32 config;
    # comparing other configs against it would overstate the speedup.
    canonical = (batch_size, img_size, k_steps) == (32, 64, 9)
    record = {
        "metric": f"genesisv2_train_throughput_{img_size}px_"
                  f"K{k_steps}_b{batch_size}",
        "value": round(im_s, 2),
        "unit": "im/s",
        "vs_baseline": round(im_s / REFERENCE_IM_S, 3) if canonical
        else None,
        "baseline_estimated": True,  # no published reference wall-clock
        "step_ms": round(1e3 / steps_s, 3),
    }
    # Measured same-host anchor: scripts/run_reference_baseline.py runs
    # the unmodified torch reference on this host's CPU and records its
    # s/batch; when its result file exists, report the measured ratio
    # alongside the GPU estimate.
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [os.environ.get("GENESIS_TPU_BASELINE_JSON", ""),
                  "/tmp/ref_baseline/result.json",
                  os.path.join(here, "evidence", "ref_baseline_cpu.json")]
    measured = next((p for p in candidates if p and os.path.exists(p)),
                    None)
    if canonical and measured:
        try:
            with open(measured) as f:
                ref = json.load(f)
            ref_im_s = float(ref["baseline_measured_cpu_im_per_s"])
            record["baseline_measured_cpu_im_s"] = round(ref_im_s, 3)
            record["vs_baseline_measured_cpu"] = round(im_s / ref_im_s, 1)
        except (KeyError, ValueError, json.JSONDecodeError):
            pass
    if flops:
        achieved = flops * steps_s
        record["flops_per_step"] = flops
        record["achieved_tflops"] = round(achieved / 1e12, 3)
        peak = peak_flops(jax.devices()[0])
        if peak:
            record["mfu"] = round(achieved / peak, 4)
            record["peak_tflops"] = peak / 1e12
    print(json.dumps(record))


if __name__ == "__main__":
    main()
