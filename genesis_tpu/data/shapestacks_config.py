"""ShapeStacks data config (reference datasets/shapestacks_config.py +
third_party/shapestacks/{shapestacks_provider,segmentation_utils}.py).

File lists come from split txt files; RGB frames are centre-cropped to
196 then resized; instance maps come from `iseg/*.map` PNGs whose first
channel encodes label*32 (bin size 256/8, segmentation_utils.py:23-42).
"""

import os
import os.path as osp
from shutil import copytree
from typing import List, Tuple

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.core.experiment import fprint
from genesis_tpu.data.loader import DataLoader, MapDataset
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_string("data_folder", "data/shapestacks",
                    "Path to data folder.")
flags.DEFINE_string("split_name", "default",
                    "{default, blocks_all, css_all}")
flags.DEFINE_integer("img_size", 64, "Dimension of images (square).")
flags.DEFINE_boolean("shuffle_test", False, "Shuffle test set.")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_boolean("load_instances", True, "Load instances.")
flags.DEFINE_boolean("copy_to_tmp", False, "Copy files to /tmp.")
flags.DEFINE_boolean("cache_images", False,
                     "Cache decoded frames in RAM: the first epoch pays "
                     "the PNG decode, later epochs serve from memory "
                     "(~28 KB/frame at 64px).")
flags.DEFINE_integer("K_steps", 9, "Number of recurrent steps.")

MAX_SHAPES = 6
CENTRE_CROP = 196
MAX_LABELS = 256
VSEG_LABEL_RESOLUTION = 8


def get_filenames_with_labels(mode: str, data_dir: str,
                              split_dir: str) -> Tuple[List[str],
                                                       List[float]]:
    """Walk split txt -> scenario dirs -> rgb-*-mono-0.png files with
    stability labels (vcom=0 & vpsf=0 => stable, label 0.0)
    (shapestacks_provider.py:34-67)."""
    list_file = osp.join(split_dir, f"{mode}.txt")
    if mode not in ("train", "eval", "test"):
        raise ValueError(f"Mode {mode} is not supported!")
    with open(list_file) as f:
        scenarios = [s for s in f.read().split("\n") if s]
    filenames, labels = [], []
    for scenario in scenarios:
        scenario_dir = osp.join(data_dir, "recordings", scenario)
        label = 0.0 if ("vcom=0" in scenario and "vpsf=0" in scenario) \
            else 1.0
        for img_file in sorted(os.listdir(scenario_dir)):
            if img_file.startswith("rgb-") and \
                    img_file.endswith("-mono-0.png"):
                filenames.append(osp.join(scenario_dir, img_file))
                labels.append(label)
    return filenames, labels


def load_segmap_as_matrix(map_path: str,
                          label_resolution: int = VSEG_LABEL_RESOLUTION
                          ) -> np.ndarray:
    """.map PNG -> label matrix: first channel holds label * bin_size."""
    from PIL import Image
    png = np.asarray(Image.open(map_path))
    bin_size = MAX_LABELS // label_resolution
    channel = png[..., 0] if png.ndim == 3 else png
    return channel.astype(np.float32) / bin_size


def _centre_crop_hw(img: np.ndarray, crop: int) -> np.ndarray:
    h, w = img.shape[0], img.shape[1]
    s1, s2 = (h - crop) // 2, (w - crop) // 2
    return img[s1:s1 + crop, s2:s2 + crop]


class ShapeStacksDataset(MapDataset):

    def __init__(self, data_dir: str, split_name: str, mode: str,
                 img_size: int = 224, load_instances: bool = True,
                 shuffle_files: bool = False, seed: int = 0,
                 cache: bool = False):
        self.data_dir = data_dir
        self.img_size = img_size
        self.load_instances = load_instances
        # Benign-race dict cache (GIL-atomic get/set; a duplicate decode
        # under num_workers threads just overwrites with equal data).
        self._cache = {} if cache else None
        split_dir = osp.join(data_dir, "splits", split_name)
        filenames, self.stability_labels = get_filenames_with_labels(
            mode, data_dir, split_dir)
        if shuffle_files:
            idx = np.arange(len(filenames))
            np.random.RandomState(seed).shuffle(idx)
            filenames = [filenames[i] for i in idx]
            self.stability_labels = [self.stability_labels[i] for i in idx]
        super().__init__(filenames, self._fetch)

    def _load_one(self, file: str):
        from PIL import Image
        if self._cache is not None:
            hit = self._cache.get(file)
            if hit is not None:
                return hit
        img = Image.open(file).convert("RGB")
        # CenterCrop(196) then Resize(img_size) with PIL bilinear
        # (torchvision transform defaults, shapestacks_config.py:126-130)
        w, h = img.size
        left, top = (w - CENTRE_CROP) // 2, (h - CENTRE_CROP) // 2
        img = img.crop((left, top, left + CENTRE_CROP, top + CENTRE_CROP))
        if self.img_size != CENTRE_CROP:
            img = img.resize((self.img_size, self.img_size),
                             Image.BILINEAR)
        out = {"input": np.asarray(img, np.uint8)}
        if self.load_instances:
            parts = file.split(os.sep)
            cam = parts[-1].split("-")[5][4:]
            map_path = osp.join(
                self.data_dir, "iseg", parts[-2],
                "iseg-w=0-f=0-l=0-c=original-cam_" + cam + "-mono-0.map")
            masks = load_segmap_as_matrix(map_path)
            masks = _centre_crop_hw(masks, CENTRE_CROP)
            if self.img_size != masks.shape[0]:
                ys = (np.arange(self.img_size) *
                      (masks.shape[0] / self.img_size)).astype(np.int64)
                masks = masks[ys][:, ys]
            out["instances"] = masks[..., None].astype(np.int32)
        if self._cache is not None:
            self._cache[file] = out
        return out

    def _fetch(self, files):
        items = [self._load_one(f) for f in files]
        batch = {"input": np.stack([i["input"] for i in items])}
        if self.load_instances:
            batch["instances"] = np.stack([i["instances"] for i in items])
        return batch


def load(cfg, **unused_kwargs):
    del unused_kwargs
    if not os.path.exists(cfg.data_folder):
        raise FileNotFoundError(
            f"Data folder does not exist: {cfg.data_folder}")

    if cfg.get("copy_to_tmp", False):
        for directory in ("recordings", "splits", "iseg"):
            src = osp.join(cfg.data_folder, directory)
            dst = osp.join("/tmp", directory)
            fprint(f"Copying dataset from {src} to {dst}.")
            if not osp.exists(dst):
                copytree(src, dst)
        cfg.data_folder = "/tmp"

    seed = cfg.get("seed", 0)
    mk = lambda mode, shuffle_files=False: ShapeStacksDataset(
        cfg.data_folder, cfg.split_name, mode, cfg.img_size,
        cfg.get("load_instances", True), shuffle_files, seed,
        cache=cfg.get("cache_images", False))
    tng_loader = DataLoader(mk("train"), cfg.batch_size, shuffle=True,
                            seed=seed)
    val_loader = DataLoader(mk("eval"), cfg.batch_size, shuffle=True,
                            seed=seed + 1)
    tst_loader = DataLoader(
        mk("test", cfg.get("shuffle_test", False)), cfg.batch_size,
        shuffle=True, seed=seed + 2)
    if not cfg.get("debug", False):
        loader_throughput(tng_loader)
    return tng_loader, val_loader, tst_loader
