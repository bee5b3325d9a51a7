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
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

H, W = 192, 256  # raw frame size (preprocess resizes+crops to 128)


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
        ) for _ in range(n_obj)])


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
    args = ap.parse_args()
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
