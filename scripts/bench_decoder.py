#!/usr/bin/env python
"""Micro-benchmark of the GENESIS-V2 decoder stack on TPU.

The deconv decoder is ~58% of the 128px/K11 forward (VERDICT r2); this
times its pieces in isolation to target kernel work: full stack, convT
layers alone, GN+ReLU overhead, each layer, and the fused Pallas deconv
when available. Shapes follow decode_latents' K-folded batch
(reference models/genesisv2_config.py:205-225).

Usage: python scripts/bench_decoder.py [--img 128 --k 11 --batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def timed(fn, *args, steps=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--k", type=int, default=11)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from genesis_tpu.ops import blocks as B

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    F = args.feat
    KB = args.k * args.batch
    key = jax.random.PRNGKey(0)

    class Dec(nn.Module):
        use_gn: bool = True
        layers: int = 4

        @nn.compact
        def __call__(self, z):
            x = B.BroadcastLayer(args.img // 16)(z)
            c = [F, F, min(F, 64), min(F, 64)]
            for i in range(self.layers):
                x = B.ConvT(c[i], 5, 2, "SAME", dtype=dt)(x)
                if self.use_gn:
                    x = nn.GroupNorm(num_groups=8, epsilon=1e-5,
                                     dtype=dt)(x)
                x = nn.relu(x)
            return B.Conv(4, 1)(x)

    z = jax.random.normal(key, (KB, F))
    rows = {}
    for name, mod in (("full(convT+GN+relu)x4+head", Dec(True)),
                      ("convT+relu only (no GN)", Dec(False))):
        v = mod.init(key, z)
        f = jax.jit(lambda v, z, m=mod: m.apply(v, z))
        out = f(v, z)
        rows[name] = timed(f, v, z, steps=args.steps)

    # Individual convT layers at their true in/out shapes.
    sizes = [args.img // 16, args.img // 8, args.img // 4, args.img // 2]
    cins = [F + 2, F, F, min(F, 64)]
    couts = [F, F, min(F, 64), min(F, 64)]
    for i, (s, ci, co) in enumerate(zip(sizes, cins, couts)):
        x = jax.random.normal(key, (KB, s, s, ci),
                              dt or jnp.float32)
        conv = B.ConvT(co, 5, 2, "SAME", dtype=dt)
        v = conv.init(key, x)
        f = jax.jit(lambda v, x, c=conv: c.apply(v, x))
        f(v, x)
        ms = timed(f, v, x, steps=args.steps)
        # FLOPs counting all 25 taps (what the MXU computes if zeros are
        # not skipped) and the zero-skipped count (XLA's cost model).
        outpix = KB * (2 * s) * (2 * s)
        fl_full = 2 * outpix * co * ci * 25
        fl_skip = fl_full / 4
        rows[f"convT L{i + 1} [{KB},{s},{s},{ci}]->{co}"] = (
            ms, fl_full / ms / 1e9, fl_skip / ms / 1e9)

    # GroupNorm+relu alone at the biggest activation.
    xbig = jax.random.normal(key, (KB, args.img, args.img,
                                   min(F, 64)), dt or jnp.float32)
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)
    vgn = gn.init(key, xbig)
    fgn = jax.jit(lambda v, x: nn.relu(gn.apply(v, x)))
    fgn(vgn, xbig)
    rows[f"GN+relu at {args.img}px"] = timed(fgn, vgn, xbig,
                                             steps=args.steps)

    print(f"\n== decoder micro-bench {args.img}px K{args.k} "
          f"b{args.batch} {args.dtype} "
          f"({jax.devices()[0].device_kind}) ==")
    for name, val in rows.items():
        if isinstance(val, tuple):
            ms, tf_full, tf_skip = val
            print(f"{name:42s} {ms:8.3f} ms   "
                  f"{tf_full:6.1f} TF/s full-tap | "
                  f"{tf_skip:6.1f} TF/s zero-skipped")
        else:
            print(f"{name:42s} {val:8.3f} ms")


if __name__ == "__main__":
    main()
