#!/usr/bin/env python
"""Generate synthetic Sketchy-shaped robot-demo episode tfrecords.

The real DeepMind Sketchy episodes (reference
`scripts/sketchy_preparation.py:22-79` reads `records/*` episode
tfrecords with `pixels/basket_front_left` / `pixels/basket_front_right`
600x960 camera frames + state features) cannot be fetched here (zero
egress). This renders arm-over-basket manipulation episodes in that
exact layout: a table with a basket holding 2-4 coloured objects and a
grey robot arm that sweeps over them along a per-episode trajectory;
the two cameras are horizontally offset views. Run
`scripts/sketchy_preparation.py --data_folder <out> --subsample 1`
afterwards to slice them into the processed 128px PNG layout
`sketchy_config.load` consumes.

Usage: python scripts/generate_sketchy_episodes.py
           [--out data/sketchy-synth] [--episodes 60]
           [--frames_per_episode 12] [--seed 0]
"""

import argparse
import io
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from genesis_tpu.data import tfrecord as tfr  # noqa: E402

H, W = 600, 960
CAMS = ("pixels/basket_front_left", "pixels/basket_front_right")


def _hsv_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return np.array([(v, t, p), (q, v, p), (p, v, t), (p, q, v),
                     (t, p, v), (v, p, q)][i], np.float32)


def make_episode(rs):
    n_obj = rs.randint(2, 5)
    return dict(
        table=_hsv_rgb(rs.uniform(0.0, 1.0), rs.uniform(0.05, 0.25),
                       rs.uniform(0.5, 0.8)),
        basket=_hsv_rgb(rs.uniform(0.05, 0.15), rs.uniform(0.3, 0.6),
                        rs.uniform(0.3, 0.55)),
        objects=[dict(
            kind=rs.randint(0, 2),
            cx=rs.uniform(0.3, 0.7), cy=rs.uniform(0.55, 0.8),
            r=rs.uniform(0.03, 0.07),
            col=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.5, 0.95),
                         rs.uniform(0.5, 0.95)),
        ) for _ in range(n_obj)],
        # Arm trajectory: start/end x (fractions) and dip depth.
        x0=rs.uniform(0.25, 0.45), x1=rs.uniform(0.55, 0.75),
        dip=rs.uniform(0.45, 0.7))


def render(ep, t, cam_shift, rs):
    """One camera frame at episode phase t in [0, 1]."""
    # Render at half resolution, upscale at the end (4x cheaper).
    h, w = H // 2, W // 2
    img = np.zeros((h, w, 3), np.float32)
    yy = np.linspace(0.0, 1.0, h)[:, None, None]
    img[:] = ep["table"] * (0.8 + 0.2 * yy)
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    # Basket: dark-rim rounded rect in the lower middle.
    bx0, bx1 = int(0.22 * w) + cam_shift, int(0.78 * w) + cam_shift
    by0, by1 = int(0.42 * h), int(0.92 * h)
    inside = (xs > bx0) & (xs < bx1) & (ys > by0) & (ys < by1)
    img[inside] = ep["basket"]
    rim = inside & ~((xs > bx0 + 6) & (xs < bx1 - 6) &
                     (ys > by0 + 6) & (ys < by1 - 6))
    img[rim] = ep["basket"] * 0.55
    # Objects in the basket.
    for obj in ep["objects"]:
        ox = obj["cx"] * w + cam_shift * 1.3
        oy = obj["cy"] * h
        orad = obj["r"] * w
        if obj["kind"] == 0:
            m = ((ys - oy) ** 2 + (xs - ox) ** 2) < orad ** 2
        else:
            m = (abs(ys - oy) < orad * 0.8) & (abs(xs - ox) < orad)
        img[m] = obj["col"]
    # Robot arm: vertical grey link from the top + gripper, sweeping
    # x0 -> x1 and dipping into the basket mid-episode.
    ax = (ep["x0"] + (ep["x1"] - ep["x0"]) * t) * w + cam_shift * 0.6
    tip = (0.25 + ep["dip"] * np.sin(np.pi * t)) * h
    arm_w = 0.022 * w
    m_link = (abs(xs - ax) < arm_w) & (ys < tip)
    img[m_link] = np.array([0.42, 0.44, 0.48], np.float32)
    edge = m_link & (abs(xs - ax) > arm_w * 0.6)
    img[edge] = np.array([0.30, 0.31, 0.34], np.float32)
    # Gripper: two fingers below the wrist.
    for fx in (-1.8, 1.8):
        mf = (abs(xs - (ax + fx * arm_w)) < arm_w * 0.5) & \
             (ys >= tip) & (ys < tip + 0.06 * h)
        img[mf] = np.array([0.22, 0.23, 0.26], np.float32)
    img += rs.normal(0, 0.012, img.shape)
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return np.repeat(np.repeat(img8, 2, axis=0), 2, axis=1)


def frame_record(ep, t, rs):
    from PIL import Image
    feats = {}
    for cam, shift in zip(CAMS, (-10, 10)):
        frame = render(ep, t, shift, rs)
        buf = io.BytesIO()
        # compress_level=1: ~4x faster encode; these are synthetic
        # intermediates the preparation step re-encodes anyway.
        Image.fromarray(frame).save(buf, format="PNG", compress_level=1)
        feats[cam] = buf.getvalue()
    ax = ep["x0"] + (ep["x1"] - ep["x0"]) * t
    feats["gripper/joints/velocity"] = [
        float(ep["x1"] - ep["x0"]), float(np.cos(np.pi * t)), float(ax)]
    return tfr.make_example(feats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/sketchy-synth")
    ap.add_argument("--episodes", type=int, default=60)
    ap.add_argument("--frames_per_episode", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rec_dir = osp.join(args.out, "records")
    os.makedirs(rec_dir, exist_ok=True)
    rs = np.random.RandomState(args.seed)
    for e in range(args.episodes):
        ep = make_episode(rs)
        recs = [frame_record(ep, fi / max(args.frames_per_episode - 1, 1),
                             rs)
                for fi in range(args.frames_per_episode)]
        tfr.write_records(
            osp.join(rec_dir, f"episode_{e:05d}.tfrecords"), recs)
        if (e + 1) % 10 == 0:
            print(f"{e + 1}/{args.episodes} episodes")
    n = args.episodes * args.frames_per_episode
    print(f"Wrote {args.episodes} episodes ({n} frames, 2 cams) "
          f"under {rec_dir}")


if __name__ == "__main__":
    main()
