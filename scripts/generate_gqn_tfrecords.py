"""Generate a synthetic rooms_ring_camera-shaped GQN dataset.

The real DeepMind GQN tfrecords cannot be fetched here (zero egress);
this writes procedurally rendered room scenes in the exact layout the
loader (and the reference `third_party/tf_gqn/gqn_tfr_provider.py`)
expects: `<out>/rooms_ring_camera/{train,test}/XXXX-of-NNNN.tfrecord`
records with a `frames` repeated-JPEG-bytes feature (sequence of 10
ring-camera views) and a `cameras` float feature (seq*5: x, y, z,
yaw, pitch).

Scenes are rooms: gradient wall + textured floor with 1-3 coloured
objects (cube / sphere-ish / cone-ish fronts); the 10 frames orbit the
ring camera so objects translate with parallax, matching the dataset's
structure (file counts come from the provider registry: 2160 train /
240 test).

Usage: python scripts/generate_gqn_tfrecords.py \
           [--out data/gqn-synth] [--records_per_file 5] [--seed 0] \
           [--train_files 2160] [--test_files 240]
"""

import argparse
import io
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from genesis_tpu.data import tfrecord as tfr  # noqa: E402

SIZE = 64
SEQ = 10


def _hsv_rgb(h, s, v):
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return np.array([(v, t, p), (q, v, p), (p, v, t), (p, q, v),
                     (t, p, v), (v, p, q)][i], np.float32)


def render_room_frame(scene, cam_angle):
    """One ring-camera view of a room scene dict."""
    img = np.zeros((SIZE, SIZE, 3), np.float32)
    yy = np.linspace(0.0, 1.0, SIZE)[:, None]
    img[:] = scene["wall"] * (1.0 - 0.3 * yy)[..., None]
    fy = scene["floor_y"]
    shade = np.linspace(1.0, 0.7, SIZE - fy)[:, None, None]
    img[fy:] = scene["floor"] * shade
    # Parallax: objects shift with the camera angle by their depth.
    for obj in scene["objects"]:
        dx = int(np.sin(cam_angle + obj["phase"]) * 14 * obj["depth"])
        w, h = obj["w"], obj["h"]
        x = np.clip(obj["x"] + dx, 0, SIZE - 1)
        bot = fy + obj["dy"]
        top = max(0, bot - h)
        l, r = max(0, x - w // 2), min(SIZE, x + w // 2)
        if r <= l or bot <= top:
            continue
        col = obj["col"] * (0.8 + 0.2 * np.cos(cam_angle + obj["phase"]))
        if obj["kind"] == 0:          # cube front
            img[top:bot, l:r] = col
        elif obj["kind"] == 1:        # sphere-ish: circle
            cy, cx = (top + bot) // 2, (l + r) // 2
            rad = min(bot - top, r - l) // 2
            ys, xs = np.ogrid[:SIZE, :SIZE]
            m = (ys - cy) ** 2 + (xs - cx) ** 2 <= rad ** 2
            img[m] = col
        else:                         # cone-ish: triangle
            for row in range(top, bot):
                frac = (row - top) / max(1, bot - top)
                hw = int(frac * (r - l) / 2)
                cx = (l + r) // 2
                img[row, cx - hw:cx + hw + 1] = col
    img += np.random.RandomState(
        int(cam_angle * 1000) % 99991).normal(0, 0.01, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_scene(rs):
    n_obj = rs.randint(1, 4)
    return dict(
        wall=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.1, 0.4),
                      rs.uniform(0.6, 0.95)),
        floor=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.2, 0.5),
                       rs.uniform(0.4, 0.7)),
        floor_y=rs.randint(int(0.55 * SIZE), int(0.75 * SIZE)),
        objects=[dict(
            kind=rs.randint(0, 3),
            x=rs.randint(8, SIZE - 8),
            dy=rs.randint(0, int(0.2 * SIZE)),
            w=rs.randint(8, 22), h=rs.randint(10, 26),
            depth=rs.uniform(0.4, 1.0),
            phase=rs.uniform(0, 2 * np.pi),
            col=_hsv_rgb(rs.uniform(0, 1), rs.uniform(0.6, 0.95),
                         rs.uniform(0.5, 0.9)),
        ) for _ in range(n_obj)])


def scene_record(rs):
    """GQN Example: frames = SEQ JPEGs, cameras = SEQ*5 floats."""
    from PIL import Image
    scene = make_scene(rs)
    jpegs = []
    cams = []
    for j in range(SEQ):
        ang = 2 * np.pi * j / SEQ
        frame = render_room_frame(scene, ang)
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
        cams.extend([np.cos(ang), np.sin(ang), 0.0, ang, 0.0])
    frames_payload = b"".join(tfr._len_delim(1, b) for b in jpegs)
    frames_feature = tfr._len_delim(1, frames_payload)
    arr = np.asarray(cams, "<f4")
    cams_feature = tfr._len_delim(2, tfr._len_delim(1, arr.tobytes()))
    entries = b""
    entries += tfr._len_delim(1, tfr._len_delim(1, b"frames")
                              + tfr._len_delim(2, frames_feature))
    entries += tfr._len_delim(1, tfr._len_delim(1, b"cameras")
                              + tfr._len_delim(2, cams_feature))
    return tfr._len_delim(1, entries)


def main():
    from genesis_tpu.data.gqn_config import DATASETS
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/gqn-synth")
    ap.add_argument("--dataset", default="rooms_ring_camera",
                    help="Registry entry; file counts come from it.")
    ap.add_argument("--records_per_file", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    info = DATASETS[args.dataset]
    rs = np.random.RandomState(args.seed)
    for folder, n in (("train", info.train_size),
                      ("test", info.test_size)):
        base = osp.join(args.out, info.basepath, folder)
        os.makedirs(base, exist_ok=True)
        digits = len(str(n))
        template = "{:0%dd}-of-{:0%dd}.tfrecord" % (digits, digits)
        for fi in range(n):
            recs = [scene_record(rs)
                    for _ in range(args.records_per_file)]
            tfr.write_records(osp.join(base, template.format(fi + 1, n)),
                              recs)
        print(f"{folder}: {n} files x {args.records_per_file} scenes "
              f"x {SEQ} frames = {n * args.records_per_file * SEQ}")
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
