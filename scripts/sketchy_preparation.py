#!/usr/bin/env python
"""Sketchy preprocessing (reference scripts/sketchy_preparation.py).

Slices DeepMind Sketchy robot-demo episodes into 128x128 PNG crops
(2 cameras x [1 full + 6 crops]) plus per-frame state arrays, with an
80/10/10 episode-file split. Episode loading uses the `sketchy` package
from deepmind-research when available; otherwise frames are read from
episode tfrecords with the native TF-free reader.
"""

import argparse
import os
import os.path as osp
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

THUMBNAIL = (128, 128)
CAMS = ("pixels/basket_front_left", "pixels/basket_front_right")


def _load_frames(episode_file: str, subsample: int):
    """Yield frame dicts {key: np.ndarray}. Prefers the deepmind-research
    `sketchy` loader; falls back to raw tfrecord Example parsing."""
    try:
        from sketchy import sketchy  # deepmind-research package
    except ImportError:
        sketchy = None
    if sketchy is not None:
        for frame in sketchy.load_frames(episode_file, subsample):
            yield {k: np.asarray(v) for k, v in frame.items()}
        return
    import io
    from PIL import Image
    from genesis_tpu.data import tfrecord as tfr
    for i, record in enumerate(tfr.iter_records(episode_file)):
        if i % subsample:
            continue
        parsed = tfr.parse_example(record)
        frame = {}
        for key, val in parsed.items():
            if "pixels" in key and isinstance(val, list):
                frame[key] = np.asarray(
                    Image.open(io.BytesIO(val[0])).convert("RGB"))
            else:
                frame[key] = np.asarray(val)
        yield frame


def process(data_folder: str = "data/sketchy", subsample: int = 4):
    from PIL import Image

    filenames = sorted(glob(f"{data_folder}/records/*"))
    num_eval = len(filenames) // 10
    valid_files = filenames[:num_eval]
    test_files = filenames[num_eval:2 * num_eval]
    train_files = filenames[2 * num_eval:]
    all_files = train_files + valid_files + test_files
    assert len(all_files) == len(set(all_files))

    episode_idx = 0
    for mode, files in zip(("train", "valid", "test"),
                           (train_files, valid_files, test_files)):
        save_folder = f"{data_folder}/processed/{mode}"
        print(f"Processing {mode} data. Destination: {save_folder}")
        os.makedirs(save_folder, exist_ok=True)
        for episode_file in files:
            ep = f"ep{str(episode_idx).zfill(6)}"
            episode_folder = f"{save_folder}/{ep}"
            os.makedirs(episode_folder, exist_ok=True)
            prefix = f"{episode_folder}/{ep}"
            for ex_idx, frame in enumerate(_load_frames(episode_file,
                                                        subsample)):
                im_fl = frame[CAMS[0]]
                im_fr = frame[CAMS[1]]
                # Crop both cameras to 448x672 (reference :51-53)
                im_fl = im_fl[71:-81, 144:-144]
                im_fr = im_fr[91:-61, 144:-144]
                assert im_fl.shape == im_fr.shape
                ss = im_fl.shape[0]              # short side
                ls = im_fl.shape[1]              # long side
                cs = ss - 64 - 32                # crop size
                mc = int(ls // 2 - cs // 2)      # middle crop location
                t = f"t{str(ex_idx).zfill(3)}"
                for im, view in zip((im_fl, im_fr), ("fl", "fr")):
                    full = Image.fromarray(
                        im[:, int(ls // 2 - ss // 2):
                           int(ls // 2 - ss // 2) + ss])
                    full = full.resize(THUMBNAIL, resample=Image.BILINEAR)
                    full.save(f"{prefix}_{t}_{view}_full.png")
                    c = 0
                    for x1, x2 in zip([0, -cs], [cs, ss + 1]):
                        for y1, y2 in zip([0, mc, -cs],
                                          [cs, mc + cs, ls + 1]):
                            crop = Image.fromarray(im[x1:x2, y1:y2, :])
                            crop = crop.resize(THUMBNAIL,
                                               resample=Image.BILINEAR)
                            crop.save(f"{prefix}_{t}_{view}_c{c}.png")
                            c += 1
                state = {k: np.asarray(v) for k, v in frame.items()
                         if "pixels" not in k}
                np.savez(f"{prefix}_{t}_state.npz", **state)
            episode_idx += 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default="data/sketchy")
    p.add_argument("--subsample", type=int, default=4)
    args = p.parse_args()
    process(args.data_folder, args.subsample)
