#!/usr/bin/env python
"""Per-stage timing breakdown of the GENESIS-V2 train step on TPU.

Times each jitted sub-stage (encoder UNet, IC-SBP attention, slot
pooling+z_head, decoder, losses) plus forward-only / full train step, so
perf work targets the actual top time sinks (SURVEY.md section 7.9,
profile-driven pass). Optionally writes a jax.profiler trace.

Usage: python scripts/perf_breakdown.py [--img 64 --k 9 --batch 32]
       [--trace_dir /tmp/v2trace] [--pallas]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, steps=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


# (bf16 peak FLOP/s, HBM bytes/s) by device_kind substring.
_ROOFLINE = (
    ("v6", (918e12, 1.64e12)),   # Trillium
    ("v5p", (459e12, 2.76e12)),
    ("v5", (197e12, 8.2e11)),    # v5e
    ("v4", (275e12, 1.2e12)),
)


def device_roofline(device):
    kind = getattr(device, "device_kind", "").lower()
    for tag, pair in _ROOFLINE:
        if tag in kind:
            return pair
    return None, None


def cost_of(jitted, *args):
    """XLA cost analysis (flops + approximate HBM bytes) of the compiled
    executable — the roofline inputs."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0))}
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trace_dir", default="")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--pallas_gn", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--byte_audit", action="store_true",
                    help="bytes-measured vs bytes-minimal per stage "
                         "(VERDICT r4 #7)")
    ap.add_argument("--slot_dtype", default="float32",
                    help="{float32,bfloat16} slot-tensor storage dtype "
                         "(the byte-audit lever; see models/"
                         "genesisv2_config.py --slot_dtype)")
    args = ap.parse_args()

    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.models import genesisv2_config
    from genesis_tpu.train import step as step_lib
    from genesis_tpu.train.state import create_train_state

    cfg = AttrDict(
        K_steps=args.k, img_size=args.img, feat_dim=64, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, montecarlo_kl=True,
        comp_ldim=16, comp_enc_channels=32, comp_dec_channels=32,
        comp_dec_layers=4, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=args.batch,
        train_iter=500000, seed=0, pallas_icsbp=args.pallas,
        pallas_gn=args.pallas_gn, slot_dtype=args.slot_dtype)
    model = genesisv2_config.load(cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, args.img, args.img, 3)
                    .astype(np.float32))
    batch = {"input": np.asarray(x)}
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, batch, key)
    variables = {"params": state.params}

    def bind(fn):
        return jax.jit(fn)

    rows = {}
    costs = {}

    # Full train step
    train_step = step_lib.jit_train_step(step_lib.make_train_step(
        model, cfg))
    # Deep-copy: train_step donates its input state, and `state`'s
    # buffers are reused by the stage timings below.
    s2 = jax.tree_util.tree_map(jnp.array, state)
    for _ in range(3):
        s2, m = train_step(s2, {"input": np.asarray(x)})
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    s2copy = s2
    for _ in range(args.steps):
        s2copy, m = train_step(s2copy, {"input": np.asarray(x)})
    jax.block_until_ready(m)
    rows["train_step(fwd+bwd+opt+geco)"] = (
        (time.perf_counter() - t0) / args.steps * 1e3)
    costs["train_step(fwd+bwd+opt+geco)"] = cost_of(
        train_step, state, {"input": np.asarray(x)})

    # Forward only
    fwd = bind(lambda v, x, k: model.apply(v, x, True, rngs={"sample": k}))
    rows["forward"] = timed(fwd, variables, x, key, steps=args.steps)
    costs["forward"] = cost_of(fwd, variables, x, key)

    # Forward + backward (grad of the total loss, no optimiser)
    def loss_fn(params, x, k):
        _, losses, _, _, _ = model.apply(
            {"params": params}, x, True, rngs={"sample": k})
        kl = sum(jnp.mean(jnp.sum(v, axis=0)) if v.ndim == 2
                 else jnp.mean(v) for kk, v in losses.items()
                 if kk != "err")
        return jnp.mean(losses["err"]) + kl
    gfn = bind(jax.grad(loss_fn))
    rows["forward+backward"] = timed(gfn, state.params, x, key,
                                     steps=args.steps)
    costs["forward+backward"] = cost_of(gfn, state.params, x, key)

    # Stages (forward)
    enc = bind(lambda v, x: model.apply(
        v, x, True, method=lambda m, x, t: jax.nn.relu(
            m.encoder(x, t)[0])))
    enc_feat = enc(variables, x)
    rows["encoder_unet"] = timed(enc, variables, x, steps=args.steps)
    costs["encoder_unet"] = cost_of(enc, variables, x)

    seg = bind(lambda v, f: model.apply(
        v, f, True, method=lambda m, f, t: m.seg_head(f, t)
        .astype(jnp.float32)))
    seg_feat = seg(variables, enc_feat)
    rows["seg_head"] = timed(seg, variables, enc_feat, steps=args.steps)
    costs["seg_head"] = cost_of(seg, variables, enc_feat)

    att = bind(lambda v, f, k: model.apply(
        v, f, True, rngs={"sample": k},
        method=lambda m, f, t: m.att_process(f, m.K_steps - 1, t,
                                             dynamic_K=m.dynamic_K)))
    log_m_k, _, _ = att(variables, seg_feat, key)
    rows["ic_sbp_attention"] = timed(att, variables, seg_feat, key,
                                     steps=args.steps)
    costs["ic_sbp_attention"] = cost_of(att, variables, seg_feat, key)

    def pool_fn(m, enc_feat, log_m_k, t):
        masks = jnp.exp(log_m_k)
        feat = m.feat_head_out(m.feat_head_conv(enc_feat, t))
        feat = feat.astype(jnp.float32)
        obj_sum = jnp.einsum("kbhwi,bhwc->kbc", masks, feat)
        mask_sum = jnp.sum(masks, axis=(2, 3, 4))
        obj_feat = obj_sum / (mask_sum[..., None] + 1e-5)
        return m.z_head(obj_feat)
    pool = bind(lambda v, f, lm: model.apply(
        v, f, lm, True, method=pool_fn))
    zparams = pool(variables, enc_feat, log_m_k)
    rows["pool+z_head"] = timed(pool, variables, enc_feat, log_m_k,
                                steps=args.steps)
    costs["pool+z_head"] = cost_of(pool, variables, enc_feat, log_m_k)

    z_k = zparams[..., :model.feat_dim]
    dec = bind(lambda v, z: model.apply(
        v, z, True, method=lambda m, z, t: m.decode_latents(z, t)))
    recon, x_r_k, log_m_r_k = dec(variables, z_k)
    rows["decoder(K-folded)"] = timed(dec, variables, z_k,
                                      steps=args.steps)
    costs["decoder(K-folded)"] = cost_of(dec, variables, z_k)

    from genesis_tpu.ops import losses as L
    xl = bind(lambda x, lm, xr: L.x_loss(x, lm, xr, 0.7))
    rows["x_loss"] = timed(xl, x, log_m_r_k, x_r_k, steps=args.steps)
    costs["x_loss"] = cost_of(xl, x, log_m_r_k, x_r_k)

    print(f"\n== GENESIS-V2 {args.img}px K{args.k} b{args.batch} "
          f"pallas={args.pallas} pallas_gn={args.pallas_gn} "
          f"({jax.devices()[0].device_kind}) ==")
    total_fwd = rows["forward"]
    for name, ms in rows.items():
        frac = ""
        if name not in ("train_step(fwd+bwd+opt+geco)", "forward",
                        "forward+backward"):
            frac = f"  ({100 * ms / total_fwd:.0f}% of fwd)"
        print(f"{name:32s} {ms:8.3f} ms{frac}")

    # Roofline accounting (VERDICT r3 #4): for each stage, the
    # compute-bound and bandwidth-bound time floors from XLA cost
    # analysis of the compiled executable; a stage near its max() bound
    # is at its hardware limit regardless of MFU.
    peak, bw = device_roofline(jax.devices()[0])
    if peak:
        print(f"\n-- roofline (peak {peak / 1e12:.0f} bf16 TF/s, "
              f"HBM {bw / 1e9:.0f} GB/s) --")
        print(f"{'stage':32s} {'meas ms':>8s} {'mxu ms':>7s} "
              f"{'hbm ms':>7s} {'bound':>5s} {'of-bound':>8s}")
        for name, ms in rows.items():
            c = costs.get(name)
            if not c or not (c["flops"] or c["bytes"]):
                continue
            t_c = c["flops"] / peak * 1e3
            t_b = c["bytes"] / bw * 1e3
            bound = max(t_c, t_b)
            kind = "MXU" if t_c >= t_b else "HBM"
            print(f"{name:32s} {ms:8.3f} {t_c:7.3f} {t_b:7.3f} "
                  f"{kind:>5s} {100 * bound / ms:7.0f}%")
        print("of-bound = hardware floor / measured "
              "(100% = at the roofline; dispatch floor ~2.3 ms/call "
              "over the tunnel inflates small stages)")

    if args.byte_audit:
        # Byte-budget audit (VERDICT r4 #7): the roofline says the step
        # runs at ~the HBM floor — audit the NUMERATOR. For each stage,
        # compare the measured bytes (XLA cost analysis of the compiled
        # executable) against two analytic floors in bf16:
        #   io    = stage inputs + outputs only (unfusable minimum)
        #   +act  = io + the layer-boundary activations a deep stage
        #           must round-trip through HBM once when VMEM can't
        #           hold the whole stage (UNet skips, decoder deconv
        #           pyramid) — the *achievable* floor.
        # Measured/floor <= ~1.15 means no >15% excess to close.
        BF2 = 2  # bf16 bytes

        def nb(*arrs):
            # bf16-equivalent bytes of concrete arrays (f32 tensors
            # could be bf16 in the ideal plan).
            return sum(int(np.prod(a.shape)) * BF2 for a in arrs)

        Bsz, H = args.batch, args.img
        K, F = args.k, model.feat_dim
        # Encoder UNet intermediates: down path halves resolution per
        # block from H, up path mirrors; channels 32,32,64,64,64 at
        # 64px (unet.py block plan), skips stored once each.
        blocks = 5 if H <= 64 else 6
        ch = [32, 32, 64, 64, 64, 64][:blocks]
        down = sum(Bsz * (H // 2 ** i) ** 2 * c
                   for i, c in enumerate(ch))
        unet_act = BF2 * (2 * down + down)  # down outs + skips + up outs
        dec_act = BF2 * sum(
            K * Bsz * (H // 2 ** i) ** 2 * F for i in range(4))

        audits = {
            "encoder_unet": (nb(x, enc_feat), nb(x, enc_feat) + unet_act),
            "seg_head": (nb(enc_feat, seg_feat), nb(enc_feat, seg_feat)),
            "ic_sbp_attention": (nb(seg_feat, log_m_k),
                                 # colour field + per-step scope chain
                                 nb(seg_feat, log_m_k)
                                 + BF2 * 2 * K * Bsz * H * H),
            "pool+z_head": (nb(enc_feat, log_m_k, zparams),
                            nb(enc_feat, log_m_k, zparams)),
            "decoder(K-folded)": (nb(z_k, recon, x_r_k, log_m_r_k),
                                  nb(z_k, recon, x_r_k, log_m_r_k)
                                  + dec_act),
            "x_loss": (nb(x, log_m_r_k, x_r_k) + 4 * Bsz,
                       nb(x, log_m_r_k, x_r_k) + 4 * Bsz),
        }
        print("\n-- byte-budget audit (bf16 floors vs XLA-measured "
              "bytes) --")
        print(f"{'stage':32s} {'meas MB':>8s} {'io MB':>7s} "
              f"{'+act MB':>8s} {'meas/+act':>9s}")
        for name, (io_b, act_b) in audits.items():
            c = costs.get(name)
            if not c or not c["bytes"]:
                continue
            mb = c["bytes"] / 1e6
            print(f"{name:32s} {mb:8.2f} {io_b / 1e6:7.2f} "
                  f"{act_b / 1e6:8.2f} {mb / (act_b / 1e6):8.2f}x")
        c = costs.get("forward")
        if c and c["bytes"]:
            io_sum = sum(a for a, _ in audits.values())
            act_sum = sum(b for _, b in audits.values())
            print(f"{'forward (sum of stages)':32s} "
                  f"{c['bytes'] / 1e6:8.2f} {io_sum / 1e6:7.2f} "
                  f"{act_sum / 1e6:8.2f} "
                  f"{c['bytes'] / act_sum:8.2f}x")
        c = costs.get("train_step(fwd+bwd+opt+geco)")
        if c and c["bytes"]:
            # fwd+bwd ~ 3x activation traffic (fwd write+read, bwd
            # re-read + cotangent) + optimiser params traffic: params
            # read + grad write + 2 adam moments read/write + params
            # write, all f32 = 7 passes over P.
            P = sum(int(np.prod(p.shape)) for p in
                    jax.tree_util.tree_leaves(state.params))
            act_sum = sum(b for _, b in audits.values())
            step_floor = 3 * act_sum + 7 * 4 * P
            print(f"{'train_step (3x act + 7x params)':32s} "
                  f"{c['bytes'] / 1e6:8.2f} {'':7s} "
                  f"{step_floor / 1e6:8.2f} "
                  f"{c['bytes'] / step_floor:8.2f}x")
        print("io = stage inputs+outputs only; +act = io + necessary "
              "layer-boundary round-trips (achievable floor); "
              "<=1.15x means no >15% excess to close.")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            s3 = s2copy  # the live (undonated) state from the timing loop
            for _ in range(10):
                s3, m = train_step(s3, {"input": np.asarray(x)})
            jax.block_until_ready(m)
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
