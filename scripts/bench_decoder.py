#!/usr/bin/env python
"""Micro-benchmark of the GENESIS-V2 decoder stack on TPU.

The deconv decoder is ~58% of the 128px/K11 forward (VERDICT r2); this
times its pieces in isolation to target kernel work. Timing harness:
the repetition loop runs INSIDE one jit as a lax.fori_loop with a
feedback perturbation (z += eps*mean(out)), so each iteration truly
executes and the per-call tunnel dispatch floor cancels out — repeated
dispatch of identical argument buffers is served from a cache on this
host and times ~0.02 ms/call, which is not a measurement.

Usage: python scripts/bench_decoder.py [--img 128 --k 11 --batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def chain_timer(f, x0, steps):
    """ms per f() execution, measured as a chained fori_loop inside one
    jit (subtracting a shorter run to cancel constant overhead)."""
    import jax
    import jax.numpy as jnp

    def run(n):
        @jax.jit
        def chained(x):
            def body(i, x):
                # Full-sum feedback: every output element feeds the
                # carry, so XLA cannot dead-code-eliminate any part of
                # f (a single-element feedback lets it slice the conv).
                out = f(x)
                fb = jnp.sum(out.astype(jnp.float32)).astype(x.dtype)
                return x + jnp.float32(1e-20).astype(x.dtype) * fb
            return jax.lax.fori_loop(0, n, body, x)

        out = chained(x0)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        out = chained(x0)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    n_hi, n_lo = steps, max(steps // 5, 1)
    t_hi, t_lo = run(n_hi), run(n_lo)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3


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

        @nn.compact
        def __call__(self, z):
            x = B.BroadcastLayer(args.img // 16)(z)
            c = [F, F, min(F, 64), min(F, 64)]
            for i in range(4):
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
        rows[name] = chain_timer(lambda x, m=mod, v=v: m.apply(v, x),
                                 z, args.steps)

    # Individual convT layers at their true in/out shapes.
    sizes = [args.img // 16, args.img // 8, args.img // 4, args.img // 2]
    cins = [F + 2, F, F, min(F, 64)]
    couts = [F, F, min(F, 64), min(F, 64)]
    for i, (s, ci, co) in enumerate(zip(sizes, cins, couts)):
        x = jax.random.normal(key, (KB, s, s, ci), dt or jnp.float32)
        conv = B.ConvT(co, 5, 2, "SAME", dtype=dt)
        v = conv.init(key, x)
        ms = chain_timer(lambda x, c=conv, v=v: c.apply(v, x), x,
                         args.steps)
        outpix = KB * (2 * s) * (2 * s)
        fl_full = 2 * outpix * co * ci * 25
        fl_skip = fl_full / 4
        rows[f"convT L{i + 1} [{KB},{s},{s},{ci}]->{co}"] = (
            ms, fl_full / ms / 1e9, fl_skip / ms / 1e9)

    # GroupNorm+relu alone at the biggest activation.
    xbig = jax.random.normal(key, (KB, args.img, args.img, min(F, 64)),
                             dt or jnp.float32)
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)
    vgn = gn.init(key, xbig)
    rows[f"GN+relu at {args.img}px"] = chain_timer(
        lambda x: nn.relu(gn.apply(vgn, x)), xbig, args.steps)

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


def bwd_bench(img=128, k=11, batch=32, feat=64, steps=40):
    """fwd+bwd timings: full decoder and the last convT layer."""
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from genesis_tpu.ops import blocks as B

    dt = jnp.bfloat16
    F = feat
    KB = k * batch
    key = jax.random.PRNGKey(0)

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, z):
            x = B.BroadcastLayer(img // 16)(z)
            c = [F, F, min(F, 64), min(F, 64)]
            for i in range(4):
                x = B.ConvT(c[i], 5, 2, "SAME", dtype=dt)(x)
                x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dt)(x)
                x = nn.relu(x)
            return B.Conv(4, 1)(x)

    mod = Dec()
    z = jax.random.normal(key, (KB, F))
    v = mod.init(key, z)

    def loss(v, z):
        return jnp.sum(mod.apply(v, z).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1))

    def fwdbwd(z):
        gv, gz = g(v, z)
        # scalar feedback from all grads
        s = sum(jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(gv)) + jnp.sum(gz)
        return s[None]

    ms = chain_timer(lambda zz: fwdbwd(zz), z, steps)
    print(f"decoder fwd+bwd: {ms:.3f} ms")

    # single L4 convT fwd+bwd
    s4, ci, co = img // 2, min(F, 64), min(F, 64)
    x = jax.random.normal(key, (KB, s4, s4, ci), dt)
    conv = B.ConvT(co, 5, 2, "SAME", dtype=dt)
    vc = conv.init(key, x)

    def loss4(vc, x):
        return jnp.sum(conv.apply(vc, x).astype(jnp.float32))
    g4 = jax.grad(loss4, argnums=(0, 1))

    def fb4(x):
        gv, gx = g4(vc, x)
        s = sum(jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(gv)) + \
            jnp.sum(gx.astype(jnp.float32))
        return s[None]

    ms4 = chain_timer(fb4, x, steps)
    # bwd-input conv flops (dense) + bwd-weight + fwd zero-skipped
    outpix = KB * img * img
    fl = 2 * outpix * co * ci * 25 / 4 * 3  # ~3x fwd minimal
    print(f"convT L4 fwd+bwd: {ms4:.3f} ms  "
          f"({fl / ms4 / 1e9:.1f} TF/s at 3x-minimal count)")


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        sys.argv.remove("--bwd")
        bwd_bench()
    else:
        main()
