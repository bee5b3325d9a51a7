#!/usr/bin/env python
"""Generate a synthetic APC-shaped dataset (raw `training/` layout).

The real Amazon Picking Challenge scans (reference
`datasets/apc_config.py:139-169` preprocess globs
`training/*/*/scene-*/frame-*.color.png` with per-frame instance masks
at `masks/frame-*.mask.png`) cannot be fetched here (zero egress). This
renders shelf-bin scenes in that exact raw layout: a bin interior with
1-5 textured box/cylinder products, several camera frames per scene
with viewpoint jitter, and integer-id instance masks. Running
`python -m genesis_tpu.data.apc_config` afterwards exercises the real
resize+centre-crop preprocessing into `processed/`, which
`apc_config.load` then splits 80/10/10 at scene level.

Usage: python scripts/generate_apc.py [--out data/apc-synth]
           [--scenes 500] [--frames_per_scene 20] [--seed 0]
           [--textured]

`--textured` raises the dataset's reconstruction floor with STRUCTURED
content: per-object stripe/checker/grain textures anchored in
object-local coordinates (they track the object under camera parallax,
so reconstructing them requires per-object latents) plus cardboard
grain and shelf slats on the bin. This is the lever the round-5 APC
negative identified — with near-uniform albedo patches the
information-free recon floor and the segmentation-bearing floor nearly
coincide, so hitting the GECO goal never forces segmentation (same
mechanism the textured ShapeStacks rerun fixed; reference precedent
for per-dataset data statistics: README.md:140).
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

H, W = 192, 256  # raw frame size (preprocess resizes+crops to 128)

_TEXTURED = False  # --textured: structured high-frequency albedo


def _obj_texture(t, u, v):
    """Multiplicative texture field in [1-a, 1+a] evaluated at
    object-local pixel coords (u, v) — anchored to the object so the
    pattern moves WITH it under camera parallax. `t` is the per-object
    texture spec sampled once at scene creation."""
    if t["kind"] == 0:    # diagonal stripes
        f = np.sin((u * t["c"] + v * t["s"]) * t["freq"] + t["phase"])
        return 1.0 + t["amp"] * np.sign(f)
    if t["kind"] == 1:    # checker
        f = (np.floor(u * t["freq"] / 4 + t["phase"])
             + np.floor(v * t["freq"] / 4)) % 2
        return 1.0 - t["amp"] + 2 * t["amp"] * f
    # smooth grain: two incommensurate sinusoids (cheap value noise)
    f = (np.sin(u * t["freq"] + t["phase"])
         * np.sin(v * t["freq"] * 0.73 + 2.1 * t["phase"]))
    return 1.0 + t["amp"] * f


def _sample_texture(rs):
    th = rs.uniform(0, np.pi)
    return dict(kind=rs.randint(0, 3), freq=rs.uniform(0.25, 0.9),
                amp=rs.uniform(0.18, 0.32), phase=rs.uniform(0, 6.28),
                c=np.cos(th), s=np.sin(th))


def _hsv_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return np.array([(v, t, p), (q, v, p), (p, v, t), (p, q, v),
                     (t, p, v), (v, p, q)][i], np.float32)


def make_scene(rs):
    """A shelf bin with 1-5 products."""
    n_obj = rs.randint(1, 6)
    return dict(
        shelf=_hsv_rgb(rs.uniform(0.05, 0.12), rs.uniform(0.4, 0.7),
                       rs.uniform(0.35, 0.6)),  # orange-brown shelf
        light=rs.uniform(0.7, 1.1),
        objects=[dict(
            kind=rs.randint(0, 3),  # box / cylinder / bag
            cx=rs.uniform(0.15, 0.85), cy=rs.uniform(0.45, 0.85),
            w=rs.uniform(0.12, 0.3), h=rs.uniform(0.12, 0.35),
            depth=rs.uniform(0.5, 1.0),
            stripe=rs.randint(0, 3),
            col=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.3, 0.9),
                         rs.uniform(0.4, 0.95)),
            col2=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.3, 0.9),
                          rs.uniform(0.4, 0.95)),
            tex=_sample_texture(rs),
        ) for _ in range(n_obj)],
        bin_tex=_sample_texture(rs),
        slat_period=rs.uniform(14, 26), slat_phase=rs.uniform(0, 30),
        bg_depth=rs.uniform(0.1, 0.25))


def render(scene, jx, jy, rs):
    """One camera frame with viewpoint jitter (jx, jy in pixels).
    Returns (rgb uint8 [H, W, 3], mask uint8 [H, W]) with instance ids
    1..n (0 = bin background)."""
    img = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), np.uint8)
    yy = np.linspace(0.0, 1.0, H)[:, None, None]
    xx = np.linspace(0.0, 1.0, W)[None, :, None]
    # Bin interior: darker at the back (top), side walls shaded.
    img[:] = scene["shelf"] * scene["light"] * (0.55 + 0.45 * yy)
    side = np.minimum(xx, 1.0 - xx)
    img *= (0.75 + 0.25 * np.clip(side / 0.12, 0, 1))
    ys = np.arange(H)[:, None]
    xs = np.arange(W)[None, :]
    if _TEXTURED:
        # Cardboard grain + horizontal shelf slats, anchored to the bin
        # (shifts with the background parallax depth under jitter).
        bgd = scene["bg_depth"]
        u = (xs - jx * bgd).astype(np.float32)
        v = (ys - jy * bgd).astype(np.float32)
        grain = _obj_texture(scene["bin_tex"], u, v)
        slat = 1.0 - 0.22 * (
            ((v + scene["slat_phase"]) % scene["slat_period"]) < 2.0)
        img *= (grain * slat)[..., None]
    order = np.argsort([o["depth"] for o in scene["objects"]])
    for rank, oi in enumerate(order):
        obj = scene["objects"][oi]
        # Parallax: nearer objects shift more under camera jitter.
        ox = obj["cx"] * W + jx * obj["depth"]
        oy = obj["cy"] * H + jy * obj["depth"]
        ow, oh = obj["w"] * W / 2, obj["h"] * H / 2
        if obj["kind"] == 0:       # box
            m = (abs(ys - oy) < oh) & (abs(xs - ox) < ow)
        elif obj["kind"] == 1:     # cylinder (vertical, rounded top)
            body = (abs(xs - ox) < ow) & (ys > oy - oh) & (ys < oy + oh)
            cap = ((ys - (oy - oh)) ** 2 / max(ow * 0.6, 1) ** 2
                   + (xs - ox) ** 2 / max(ow, 1) ** 2) < 1.0
            m = body | cap
        else:                      # bag: ellipse
            m = ((ys - oy) ** 2 / max(oh, 1) ** 2
                 + (xs - ox) ** 2 / max(ow, 1) ** 2) < 1.0
        col = obj["col"] * scene["light"]
        if obj["stripe"] == 1:     # horizontal label band
            band = abs(ys - oy) < 0.3 * oh
            img_band = m & band
            img[img_band] = obj["col2"] * scene["light"]
            m_rest = m & ~band
            img[m_rest] = col
        elif obj["stripe"] == 2:   # vertical stripes
            stripes = ((xs - ox) // max(int(ow / 2), 2) % 2 == 0)
            img[m & stripes] = col
            img[m & ~stripes] = obj["col2"] * scene["light"]
        else:
            shade = np.broadcast_to(
                (0.8 + 0.2 * np.clip((xs - ox + ow) / max(2 * ow, 1),
                                     0, 1))[..., None], (H, W, 1))
            img[m] = col * shade[m]
        if _TEXTURED:
            # Multiplicative texture in object-LOCAL coordinates: the
            # pattern tracks the object under camera parallax, so
            # reconstructing it needs a per-object latent rather than
            # a global background field.
            tfield = _obj_texture(obj["tex"],
                                  (xs - ox).astype(np.float32),
                                  (ys - oy).astype(np.float32))
            img[m] *= np.broadcast_to(tfield[..., None], (H, W, 3))[m]
        mask[m] = rank + 1
    img += rs.normal(0, 0.015, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), mask


def main():
    from PIL import Image
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/apc-synth")
    ap.add_argument("--scenes", type=int, default=500)
    ap.add_argument("--frames_per_scene", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--textured", action="store_true",
                    help="structured per-object + bin textures (raises "
                         "the recon floor with segmentation-bearing "
                         "content; see module docstring)")
    args = ap.parse_args()
    if args.textured:
        global _TEXTURED
        _TEXTURED = True
    rs = np.random.RandomState(args.seed)
    warehouses = ("warehouse-a", "warehouse-b")
    objsets = ("office", "kitchen", "tools")
    for si in range(args.scenes):
        scene = make_scene(rs)
        base = osp.join(args.out, "training",
                        warehouses[si % len(warehouses)],
                        objsets[si % len(objsets)], f"scene-{si:04d}")
        os.makedirs(osp.join(base, "masks"), exist_ok=True)
        for fi in range(args.frames_per_scene):
            jx = rs.uniform(-12, 12)
            jy = rs.uniform(-6, 6)
            rgb, mask = render(scene, jx, jy, rs)
            Image.fromarray(rgb).save(
                osp.join(base, f"frame-{fi:06d}.color.png"))
            Image.fromarray(mask).save(
                osp.join(base, "masks", f"frame-{fi:06d}.mask.png"))
        if (si + 1) % 50 == 0:
            print(f"{si + 1}/{args.scenes} scenes")
    n = args.scenes * args.frames_per_scene
    print(f"Wrote {n} frames under {args.out}/training")


if __name__ == "__main__":
    main()
