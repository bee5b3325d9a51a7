#!/usr/bin/env python
"""Generate a clevr_with_masks-shaped GZIP tfrecord dataset.

Produces `<out>/clevr_with_masks/clevr_with_masks_train.tfrecords` with
the DeepMind CLEVR feature layout (image [240,320,3] uint8, mask
[11,240,320,1] uint8 in {0,255}, per-entity float features x/y/z/
pixel_coords/rotation/visibility; reference
third_party/multi_object_datasets/clevr_with_masks.py) so the native
tfrecord MultiObjectLoader (genesis_tpu/data/multi_object_config.py,
IODINE crop-192 protocol) can feed real 128px/K11 training runs
end-to-end without the un-downloadable original.

Scenes are CLEVR-morphology stand-ins rendered in numpy: a grey ground
plane with a luminance horizon, 3-10 shaded objects (spheres, boxes,
cylinders) in the 8 CLEVR colours and 2 sizes, depth-sorted painter's
occlusion, Lambert-ish shading + specular dot for "metal", and soft
ground shadows (shadows are NOT part of the instance masks, as in the
original).

Usage: python scripts/generate_clevr_tfrecords.py \
           [--out data/multi-object-synth] [--n 30000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

H, W = 240, 320
ENTITIES = 11  # background + up to 10 objects
MAX_OBJECTS = 10

# CLEVR colour palette (gray, red, blue, green, brown, purple, cyan,
# yellow) — values from the original blender config, scaled to [0,1].
COLOURS = np.array([
    [87, 87, 87], [173, 35, 35], [42, 75, 215], [29, 105, 20],
    [129, 74, 25], [129, 38, 192], [41, 208, 208], [255, 238, 51],
], np.float32) / 255.0

_YY, _XX = np.mgrid[0:H, 0:W].astype(np.float32)


def _background(rs):
    """Grey ground plane, brighter toward the horizon, mild texture.

    The noise is rendered at quarter resolution and upsampled — visually
    similar grain, but it GZIP-compresses ~10x better than iid per-pixel
    noise (this file ships 40k+ frames) and renders in one pass.
    """
    base = rs.uniform(0.35, 0.5)
    horizon = rs.uniform(60, 100)
    shade = base + 0.25 * np.clip((horizon - _YY) / H + 0.35, 0.0, 1.0)
    canvas = np.repeat(shade[..., None], 3, axis=-1)
    small = rs.normal(0, 0.012, (H // 4, W // 4, 1)).astype(np.float32)
    canvas += np.repeat(np.repeat(small, 4, axis=0), 4, axis=1)
    return np.clip(canvas, 0.0, 1.0).astype(np.float32)


def _window(cx, cy, r):
    """Bounding box [y0:y1, x0:x1] covering an object + its shadow
    (extent <= 2.2r) — per-object work is O(r^2), not O(H*W)."""
    y0 = max(int(cy - 2.2 * r), 0)
    y1 = min(int(cy + 2.2 * r) + 2, H)
    x0 = max(int(cx - 2.2 * r), 0)
    x1 = min(int(cx + 2.2 * r) + 2, W)
    return y0, y1, x0, x1


def _shadow(canvas, xx, yy, cx, cy, r):
    d = (((xx - (cx + 0.55 * r)) / (1.5 * r)) ** 2
         + ((yy - (cy + 0.55 * r)) / (0.6 * r)) ** 2)
    soft = np.clip(1.0 - d, 0.0, 1.0)
    canvas *= (1.0 - 0.35 * soft)[..., None]


def _shade(colour, lam, metal):
    """[h,w] lambert field -> [h,w,3] shaded colour with optional spec."""
    img = colour[None, None] * (0.45 + 0.55 * lam)[..., None]
    if metal:
        spec = np.clip(lam - 0.75, 0, 1) * 3.0
        img = img + spec[..., None] * 0.7
    return img


def _draw_object(canvas, entity, label, cy, rs):
    """Paint one object (+ its ground shadow) into windowed views of the
    canvas and the entity-label map; returns (cx, depth, size)."""
    shape = rs.randint(3)            # 0=sphere, 1=box, 2=cylinder
    colour = COLOURS[rs.randint(len(COLOURS))]
    metal = rs.rand() < 0.5
    depth = (cy - 100.0) / 115.0     # 0 far, 1 near
    size = rs.choice([16.0, 27.0]) * (0.65 + 0.6 * depth)
    cx = rs.uniform(size, W - size)
    lx, ly = rs.uniform(0.4, 0.8), rs.uniform(0.4, 0.8)

    y0, y1, x0, x1 = _window(cx, cy, size)
    xx, yy = _XX[y0:y1, x0:x1], _YY[y0:y1, x0:x1]
    win = canvas[y0:y1, x0:x1]       # view: writes land in the canvas
    _shadow(win, xx, yy, cx, cy, size)
    dx, dy = (xx - cx) / size, (yy - cy) / size
    if shape == 0:                   # sphere: circle + normal shading
        d2 = dx ** 2 + dy ** 2
        mask = d2 <= 1.0
        nz = np.sqrt(np.clip(1.0 - d2, 0.0, 1.0))
        lam = np.clip(-dx * -lx + -dy * ly + nz * 0.8, 0.0, 1.2)
    elif shape == 1:                 # box: front face + lighter top face
        front = (np.abs(dx) <= 0.85) & (dy >= -0.45) & (dy <= 1.0)
        top = (np.abs(dx + (dy + 0.45) * 0.35) <= 0.85) \
            & (dy >= -0.95) & (dy < -0.45)
        mask = front | top
        lam = np.where(top, 1.05, 0.55 + 0.25 * lx) * np.ones_like(dx)
    else:                            # cylinder: barrel + elliptic cap
        barrel = (np.abs(dx) <= 0.7) & (dy >= -0.8) & (dy <= 1.0)
        cap = (dx / 0.7) ** 2 + ((dy + 0.8) / 0.25) ** 2 <= 1.0
        mask = barrel | cap
        lam = np.clip(1.0 - np.abs(dx / 0.7 + 0.3 * (1 - lx)), 0.1, 1.0)
        lam = np.where(cap, 1.1, lam)
    win[mask] = np.clip(_shade(colour, lam, metal), 0, 1)[mask]
    entity[y0:y1, x0:x1][mask] = label
    return cx, depth, size


def generate_clevr_scene(rs):
    """Returns (image u8 [240,320,3], mask u8 [11,240,320,1], feats)."""
    canvas = _background(rs)
    n = rs.randint(3, MAX_OBJECTS + 1)
    # Far-to-near painter's order (sorted by ground-plane y): nearer
    # objects overwrite farther ones in both the canvas and the entity
    # masks — true depth occlusion.
    entity = np.zeros((H, W), np.uint8)  # 0 = background
    feats = np.zeros((ENTITIES, 6), np.float32)  # x,y,z,rot,vis,size
    # Actual pixel-space (cx, cy, depth), matching the DeepMind
    # clevr_with_masks pixel_coords layout (x/y in pixels).
    pix = np.zeros((ENTITIES, 3), np.float32)
    cys = np.sort(rs.uniform(100, 215, size=n))
    for slot, cy in enumerate(cys):
        cx, depth, size = _draw_object(canvas, entity, slot + 1, cy, rs)
        feats[slot + 1] = (cx / W * 6 - 3, cy / H * 6 - 3, 1 - depth,
                           rs.uniform(0, 360), 1.0, size)
        pix[slot + 1] = (cx, cy, 1 - depth)
    img8 = np.round(canvas * 255).astype(np.uint8)
    masks = np.zeros((ENTITIES, H, W, 1), np.uint8)
    for e in range(ENTITIES):
        masks[e, entity == e, 0] = 255
    feats[0, 4] = 1.0  # background entity visible
    return img8, masks, feats, pix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/multi-object-synth")
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from genesis_tpu.data import tfrecord as tfr

    path = os.path.join(args.out, "clevr_with_masks",
                        "clevr_with_masks_train.tfrecords")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(args.seed)

    def records():
        for i in range(args.n):
            img8, masks, feats, pix = generate_clevr_scene(rs)
            if (i + 1) % 2000 == 0:
                print(f"{i + 1}/{args.n}", flush=True)
            yield tfr.make_example({
                "image": img8.tobytes(),
                "mask": masks.tobytes(),
                "x": feats[:, 0], "y": feats[:, 1], "z": feats[:, 2],
                "pixel_coords": pix.ravel(),
                "rotation": feats[:, 3], "visibility": feats[:, 4],
            })

    tfr.write_records(path, records(), compression="GZIP")
    sz = os.path.getsize(path) / 1e6
    print(f"Wrote {args.n} frames to {path} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
