"""Sketchy robot-demo data config (reference datasets/sketchy_config.py).

Glob/split-file based PNG dataset, 128x128 only, no instance labels,
K_steps=10 (3 objects + robot base/gripper/wrist/arm + ground + cables +
wall).
"""

import os
import os.path as osp
from glob import glob

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.core.experiment import fprint
from genesis_tpu.data.loader import DataLoader, MapDataset
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_string("data_folder", "data/sketchy", "Path to data folder.")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_integer("img_size", 128, "Dimension of images (square).")
flags.DEFINE_integer("K_steps", 10, "Number of object slots.")


def _fetch_pngs(files):
    from PIL import Image
    imgs = [np.asarray(Image.open(f).convert("RGB"), np.uint8)
            for f in files]
    return {"input": np.stack(imgs)}


class SketchyDataset(MapDataset):

    def __init__(self, data_dir: str, mode: str):
        split_file = osp.join(data_dir, "processed", f"{mode}_images.txt")
        if osp.exists(split_file):
            fprint(f"Reading paths for {mode} files...")
            with open(split_file) as f:
                filenames = [line.strip() for line in f if line.strip()]
        else:
            fprint(f"Searching for {mode} files...")
            filenames = sorted(glob(
                osp.join(data_dir, "processed", mode, "ep*", "ep*.png")))
            with open(split_file, "w") as f:
                for item in filenames:
                    f.write(f"{item}\n")
        fprint(f"Found {len(filenames)}.")
        super().__init__(filenames, _fetch_pngs)


def load(cfg, **unused_kwargs):
    del unused_kwargs
    if not os.path.exists(cfg.data_folder):
        raise FileNotFoundError(
            f"Data folder does not exist: {cfg.data_folder}")
    assert cfg.img_size == 128
    seed = cfg.get("seed", 0)
    tng_loader = DataLoader(SketchyDataset(cfg.data_folder, "train"),
                            cfg.batch_size, shuffle=True, seed=seed)
    val_loader = DataLoader(SketchyDataset(cfg.data_folder, "valid"),
                            cfg.batch_size, shuffle=True, seed=seed + 1)
    tst_loader = DataLoader(SketchyDataset(cfg.data_folder, "test"),
                            1, shuffle=True, seed=seed + 2)
    if not cfg.get("debug", False):
        loader_throughput(tng_loader)
    return tng_loader, val_loader, tst_loader
