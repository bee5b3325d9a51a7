"""Generate a synthetic ShapeStacks-shaped dataset at training scale.

Real ShapeStacks (https://shapestacks.robots.ox.ac.uk) cannot be fetched
in this environment; this writes procedurally rendered block-tower
scenes in the EXACT on-disk layout the loader (and the reference
`third_party/shapestacks/shapestacks_provider.py:34-67` +
`segmentation_utils.py:23-42`) consumes:

    <out>/recordings/<scenario>/rgb-w=..-mono-0.png   224x224 RGB
    <out>/iseg/<scenario>/iseg-..-cam_<j>-mono-0.map  224x224 PNG,
        channel 0 = instance label * 32 (bin 256/8)
    <out>/splits/default/{train,eval,test}.txt        scenario lists

Scenes are camera-consistent block towers (h in [2,6] cuboids with lit
front/top/side faces on a gradient sky + textured floor), so a model
trained on them faces a real multi-object segmentation problem: per-cam
views shift the tower horizontally and scale it slightly, mimicking the
reference's 16-camera recordings. Scenario names carry the stability
fields (`vcom`, `vpsf`) the provider parses into labels.

Usage: python scripts/generate_shapestacks.py \
           [--out data/shapestacks-synth] [--train 1250] [--eval 40] \
           [--test 40] [--cams 8] [--seed 0]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

SIZE = 224
BIN = 32          # label * BIN in .map channel 0 (MAX_LABELS=256, res=8)
MAX_H = 6


def _hsv_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    rgb = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v),
           (v, p, q)][i]
    return np.array(rgb, np.float32)


_UNTEXTURED = False  # --untextured: flat-colour renders (g_goal studies)


def _texture(rs, h, w, kind=None):
    """Multiplicative texture field in [1-a, 1+a] — stripes, checker or
    smooth noise. Keeps reconstruction genuinely hard so the GECO err
    constraint stays binding (real ShapeStacks frames are visually
    rich; flat-colour renders saturate err early and trigger premature
    beta ramp)."""
    if _UNTEXTURED:
        return np.ones((h, w, 1), np.float32)
    if kind is None:
        kind = rs.randint(0, 3)
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    if kind == 0:      # diagonal stripes
        f = rs.uniform(0.15, 0.9)
        ang = rs.uniform(0, np.pi)
        field = np.sin((np.cos(ang) * xs + np.sin(ang) * ys) * f)
    elif kind == 1:    # checker
        p = rs.randint(4, 14)
        field = (((ys // p) + (xs // p)) % 2) * 2.0 - 1.0
    else:              # smooth low-freq noise
        gh, gw = max(2, h // 16), max(2, w // 16)
        g = rs.randn(gh, gw)
        iy = (ys * (gh - 1) / max(1, h - 1)).astype(np.int64)
        ix = (xs * (gw - 1) / max(1, w - 1)).astype(np.int64)
        field = g[iy[:, 0]][:, ix[0]]
        field /= max(1e-6, np.abs(field).max())
    amp = rs.uniform(0.06, 0.18)
    return 1.0 + amp * field[..., None]


def render_scene(rs, n_blocks, cam):
    """One camera view: (rgb uint8 [S,S,3], labels uint8 [S,S])."""
    img = np.zeros((SIZE, SIZE, 3), np.float32)
    labels = np.zeros((SIZE, SIZE), np.uint8)
    yy = np.linspace(0.0, 1.0, SIZE)[:, None]

    # Sky gradient + floor plane (background stays label 0, like the
    # real dataset where ARI-FG excludes it).
    sky = _hsv_rgb(rs.uniform(0.52, 0.64), rs.uniform(0.15, 0.45),
                   rs.uniform(0.75, 0.95))
    img[:] = sky * (1.0 - 0.35 * yy)[..., None]
    floor_y = int(SIZE * rs.uniform(0.68, 0.80))
    floor = _hsv_rgb(rs.uniform(0.05, 0.13), rs.uniform(0.25, 0.55),
                     rs.uniform(0.45, 0.7))
    shade = np.linspace(1.0, 0.75, SIZE - floor_y)[:, None, None]
    img[floor_y:] = floor * shade * _texture(rs, SIZE - floor_y, SIZE)
    # Wall clutter: a few distant background rectangles (stay label 0).
    for _ in range(rs.randint(2, 6)):
        bw = rs.randint(10, 50)
        bh = rs.randint(8, 30)
        bx, by = rs.randint(0, SIZE - bw), rs.randint(0, max(1, floor_y - bh))
        col = _hsv_rgb(rs.uniform(0, 1), rs.uniform(0.1, 0.4),
                       rs.uniform(0.5, 0.9))
        img[by:by + bh, bx:bx + bw] = (
            0.5 * img[by:by + bh, bx:bx + bw] + 0.5 * col)

    # Camera: horizontal offset + slight zoom per view index.
    cam_dx = int((cam / 7.0 - 0.5) * 0.28 * SIZE)
    zoom = 1.0 + 0.06 * np.sin(cam * 1.3)

    # Tower of n_blocks cuboids, bottom-up from the floor line.
    base_x = SIZE // 2 + cam_dx + int(rs.uniform(-0.06, 0.06) * SIZE)
    y = floor_y
    widths = rs.uniform(0.16, 0.30, n_blocks) * SIZE * zoom
    heights = rs.uniform(0.09, 0.16, n_blocks) * SIZE * zoom
    hues = (rs.uniform(0, 1) + np.arange(n_blocks) *
            rs.uniform(0.23, 0.41)) % 1.0
    for k in range(n_blocks):
        w, h = int(widths[k]), int(heights[k])
        x = base_x + int(rs.uniform(-0.25, 0.25) * w)
        top, bot = max(0, y - h), y
        l, r = max(0, x - w // 2), min(SIZE, x + w // 2)
        if r <= l or bot <= top:
            y = top
            continue
        col = _hsv_rgb(hues[k], rs.uniform(0.6, 0.95),
                       rs.uniform(0.55, 0.9))
        img[top:bot, l:r] = col * _texture(rs, bot - top, r - l)  # front
        d = max(2, w // 8)                            # 3D hint: top/side
        t2 = max(0, top - d)
        img[t2:top, min(l + d, SIZE):min(r + d, SIZE)] = col * 1.25
        img[top:bot, r:min(r + d, SIZE)] = col * 0.65
        labels[top:bot, l:r] = k + 1
        labels[t2:top, min(l + d, SIZE):min(r + d, SIZE)] = k + 1
        labels[top:bot, r:min(r + d, SIZE)] = k + 1
        y = top
    # Mild sensor noise.
    img += rs.normal(0.0, 0.015, img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), labels


def write_split(root, scenarios, mode):
    split_dir = osp.join(root, "splits", "default")
    os.makedirs(split_dir, exist_ok=True)
    with open(osp.join(split_dir, f"{mode}.txt"), "w") as f:
        f.write("\n".join(scenarios) + "\n")


def main():
    from PIL import Image
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/shapestacks-synth")
    ap.add_argument("--train", type=int, default=1250)
    ap.add_argument("--eval", type=int, default=40)
    ap.add_argument("--test", type=int, default=40)
    ap.add_argument("--cams", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--untextured", action="store_true",
                    help="flat-colour renders (easy data; used by the "
                         "g_goal sensitivity study)")
    args = ap.parse_args()
    if args.untextured:
        global _UNTEXTURED
        _UNTEXTURED = True
    rs = np.random.RandomState(args.seed)

    splits = [("train", args.train), ("eval", args.eval),
              ("test", args.test)]
    idx = 0
    for mode, count in splits:
        scenarios = []
        for _ in range(count):
            n_blocks = rs.randint(2, MAX_H + 1)
            vcom = rs.randint(0, 2)
            name = (f"env_ccs-hard-h={n_blocks}-vcom={vcom}-vpsf=0"
                    f"-v={idx}")
            idx += 1
            scenarios.append(name)
            rec = osp.join(args.out, "recordings", name)
            iseg = osp.join(args.out, "iseg", name)
            os.makedirs(rec, exist_ok=True)
            os.makedirs(iseg, exist_ok=True)
            for cam in range(args.cams):
                rgb, labels = render_scene(rs, n_blocks, cam)
                Image.fromarray(rgb).save(
                    osp.join(rec, f"rgb-w=5-f=2-l=1-c=unique-cam_{cam}"
                             "-mono-0.png"))
                Image.fromarray(labels * BIN).save(
                    osp.join(iseg, "iseg-w=0-f=0-l=0-c=original-cam_"
                             f"{cam}-mono-0.map"), format="PNG")
        write_split(args.out, scenarios, mode)
        print(f"{mode}: {count} scenarios x {args.cams} cams = "
              f"{count * args.cams} frames")
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
