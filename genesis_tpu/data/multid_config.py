"""Multi-dSprites data config (reference datasets/multid_config.py).

npy-backed with optional memory mapping; images stored uint8 HWC are
normalised to float32 [0,1] NHWC at batch time (the ToTensor equivalent),
instances emitted as int32 [B,H,W,1].
"""

import os
import os.path as osp

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.data.loader import ArrayDataset, DataLoader
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_string("data_folder", "data/multi_dsprites/processed",
                    "Path to data folder.")
flags.DEFINE_boolean("unique_colours", False,
                     "Dataset with unique colours.")
flags.DEFINE_boolean("load_instances", True, "Load instances.")
flags.DEFINE_integer("img_size", 64, "Dimension of images (square).")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_boolean("mem_map", False, "Use memory mapping.")
flags.DEFINE_integer("K_steps", 5, "Number of recurrent steps.")


def _resize_nearest_batch(x: np.ndarray, size: int) -> np.ndarray:
    """Nearest resize for [B,H,W,C] numpy batches (torch F.interpolate
    nearest semantics: index floor(i*scale))."""
    h, w = x.shape[1], x.shape[2]
    ys = (np.arange(size) * (h / size)).astype(np.int64)
    xs = (np.arange(size) * (w / size)).astype(np.int64)
    return x[:, ys][:, :, xs]


class MultiDSpritesDataset(ArrayDataset):
    def __init__(self, file_path: str, load_instances: bool = True,
                 img_size: int = 64, mem_map: bool = False):
        mmap = "r" if mem_map else None
        arrays = {"images": np.load(file_path, mmap_mode=mmap)}
        if load_instances:
            arrays["masks"] = np.load(
                file_path.replace("images", "masks"), mmap_mode=mmap)
        self.img_size = img_size
        super().__init__(arrays, transform=self._to_batch)

    def _to_batch(self, raw):
        img = raw["images"]
        # Decide scaling by STORAGE dtype, not values: uint8 ships as-is
        # (normalised on device by prepare_input); float storage (the
        # generator saves [0,1] floats) passes through.
        if img.dtype != np.uint8:
            img = img.astype(np.float32)
        if img.shape[1] == 3 and img.shape[-1] != 3:  # NCHW -> NHWC
            img = np.moveaxis(img, 1, -1)
        if self.img_size != img.shape[1]:
            img = _resize_nearest_batch(img, self.img_size)
        out = {"input": img}
        if "masks" in raw:
            ins = raw["masks"]
            if ins.ndim == 3:
                ins = ins[..., None]
            if ins.shape[1] == 1 and ins.shape[-1] != 1:
                ins = np.moveaxis(ins, 1, -1)
            if self.img_size != ins.shape[1]:
                ins = _resize_nearest_batch(ins, self.img_size)
            out["instances"] = ins.astype(np.int32)
        return out


def load(cfg, **unused_kwargs):
    del unused_kwargs
    if not os.path.exists(cfg.data_folder):
        raise FileNotFoundError(
            f"Data folder does not exist: {cfg.data_folder}")
    suffix = "_unique" if cfg.get("unique_colours", False) else ""
    paths = {
        "train": f"training_images_rand4{suffix}.npy",
        "val": f"validation_images_rand4{suffix}.npy",
        "test": f"test_images_rand4{suffix}.npy",
    }
    loaders = []
    for split, fname in paths.items():
        ds = MultiDSpritesDataset(
            osp.join(cfg.data_folder, fname),
            cfg.get("load_instances", True),
            cfg.img_size, cfg.get("mem_map", False))
        loaders.append(DataLoader(
            ds, cfg.batch_size, shuffle=True,
            seed=cfg.get("seed", 0)))
    if not cfg.get("debug", False):
        loader_throughput(loaders[0])
    return tuple(loaders)
