#!/usr/bin/env python
"""Generate a tetrominoes-shaped GZIP tfrecord dataset.

Produces `<out>/tetrominoes/tetrominoes_train.tfrecords` with the
DeepMind tetrominoes feature layout (image [35,35,3] uint8, mask
[4,35,35,1] uint8 in {0,255}, per-entity float features
x/y/shape/color/visibility; reference
third_party/multi_object_datasets/tetrominoes.py) for the native
tfrecord MultiObjectLoader's 32px/K4 protocol
(genesis_tpu/data/multi_object_config.py:46).

Scenes mirror the original's morphology: exactly 3 tetrominoes (all 19
one-sided orientations, 5px cells) in saturated colours on a black
background, placed without overlap by rejection sampling.

Usage: python scripts/generate_tetrominoes_tfrecords.py \
           [--out data/multi-object-synth] [--n 60000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

H = W = 35
CELL = 5
ENTITIES = 4  # background + 3 tetrominoes
N_PIECES = 3

# The 19 one-sided tetromino orientations as cell lists (row, col).
_BASE = {
    "I": [(0, 0), (0, 1), (0, 2), (0, 3)],
    "O": [(0, 0), (0, 1), (1, 0), (1, 1)],
    "T": [(0, 0), (0, 1), (0, 2), (1, 1)],
    "S": [(1, 0), (1, 1), (0, 1), (0, 2)],
    "Z": [(0, 0), (0, 1), (1, 1), (1, 2)],
    "J": [(0, 0), (1, 0), (1, 1), (1, 2)],
    "L": [(0, 2), (1, 0), (1, 1), (1, 2)],
}


def _rotations(cells):
    outs, seen = [], set()
    cur = cells
    for _ in range(4):
        norm = sorted((r - min(r for r, _ in cur),
                       c - min(c for _, c in cur)) for r, c in cur)
        key = tuple(norm)
        if key not in seen:
            seen.add(key)
            outs.append(norm)
        cur = [(c, -r) for r, c in cur]
    return outs


SHAPES = [rot for name in sorted(_BASE)
          for rot in _rotations(_BASE[name])]  # 19 orientations


def generate_tetrominoes_scene(rs):
    # Outer loop: if any piece exhausts its placement budget, re-draw the
    # WHOLE scene rather than painting an overlapping piece — the masks
    # (and the loader test) rely on the non-overlap invariant.
    while True:
        img = np.zeros((H, W, 3), np.uint8)
        masks = np.zeros((ENTITIES, H, W, 1), np.uint8)
        feats = np.zeros((ENTITIES, 6), np.float32)  # x,y,shape,r,g,b
        occupied = np.zeros((H, W), bool)
        ok = True
        for k in range(1, N_PIECES + 1):
            for _ in range(100):  # rejection-sample a free placement
                sid = rs.randint(len(SHAPES))
                cells = SHAPES[sid]
                hh = max(r for r, _ in cells) + 1
                ww = max(c for _, c in cells) + 1
                r0 = rs.randint(0, H - hh * CELL + 1)
                c0 = rs.randint(0, W - ww * CELL + 1)
                m = np.zeros((H, W), bool)
                for (r, c) in cells:
                    m[r0 + r * CELL:r0 + (r + 1) * CELL,
                      c0 + c * CELL:c0 + (c + 1) * CELL] = True
                if not (m & occupied).any():
                    break
            else:
                ok = False
                break
            occupied |= m
            colour = rs.randint(64, 256, size=3).astype(np.uint8)
            img[m] = colour
            masks[k, m, 0] = 255
            feats[k] = (c0 / W, r0 / H, float(sid),
                        *(colour.astype(np.float32) / 255.0))
        if not ok:
            continue
        masks[0, ~occupied, 0] = 255
        feats[0] = 0.0
        return img, masks, feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/multi-object-synth")
    ap.add_argument("--n", type=int, default=60000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from genesis_tpu.data import tfrecord as tfr

    path = os.path.join(args.out, "tetrominoes",
                        "tetrominoes_train.tfrecords")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(args.seed)

    def records():
        vis = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
        for i in range(args.n):
            img, masks, feats = generate_tetrominoes_scene(rs)
            if (i + 1) % 10000 == 0:
                print(f"{i + 1}/{args.n}", flush=True)
            yield tfr.make_example({
                "image": img.tobytes(), "mask": masks.tobytes(),
                "x": feats[:, 0], "y": feats[:, 1],
                "shape": feats[:, 2],
                "color": feats[:, 3:6].ravel().astype(np.float32),
                "visibility": vis,
            })

    tfr.write_records(path, records(), compression="GZIP")
    sz = os.path.getsize(path) / 1e6
    print(f"Wrote {args.n} frames to {path} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
