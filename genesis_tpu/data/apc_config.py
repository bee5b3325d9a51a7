"""Amazon Picking Challenge data config (reference datasets/apc_config.py).

Scene-level random 80/10/10 split with fixed seed; PNG images + mask PNGs
(fallback to zero masks when missing); `preprocess()` resizes + centre
crops the raw APC data to 128 (invoked via
`python -m genesis_tpu.data.apc_config`).
"""

import os
import os.path as osp
import random
from glob import glob

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.core.experiment import fprint
from genesis_tpu.data.loader import DataLoader, MapDataset
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_string("data_folder", "data/apc", "Path to data folder.")
flags.DEFINE_integer("img_size", 128, "Dimension of images (square).")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_integer("K_steps", 10, "Number of component steps.")


def _fetch_apc(files):
    from PIL import Image
    imgs, masks = [], []
    for fp in files:
        img = np.asarray(Image.open(fp).convert("RGB"), np.uint8)
        imgs.append(img)
        mfp = fp.replace("frame", "masks/frame").replace("color", "mask")
        try:
            mask = np.asarray(Image.open(mfp)).astype(np.int32)
            if mask.ndim == 3:
                mask = mask[..., 0]
        except FileNotFoundError:
            mask = np.zeros(img.shape[:2], np.int32)
        masks.append(mask[..., None])
    return {"input": np.stack(imgs), "instances": np.stack(masks)}


class APCDataset(MapDataset):
    def __init__(self, image_paths):
        super().__init__(image_paths, _fetch_apc)


def _create_splits(data_folder: str):
    """Random scene-level 80/10/10 split with fixed seed
    (apc_config.py:55-79)."""
    fprint("Creating new train/val/test splits...")
    all_scenes = sorted(glob(f"{data_folder}/processed/*/*/scene-*"))
    random.seed(0)
    random.shuffle(all_scenes)
    n_eval = len(all_scenes) // 10
    train_scenes = all_scenes[2 * n_eval:]
    val_scenes = all_scenes[:n_eval]
    test_scenes = all_scenes[n_eval:2 * n_eval]
    for mode, scenes in zip(("train", "val", "test"),
                            (train_scenes, val_scenes, test_scenes)):
        img_paths = []
        for sc in scenes:
            img_paths += glob(f"{sc}/frame-*.color.png")
        with open(f"{data_folder}/{mode}_images.txt", "w") as f:
            for item in sorted(img_paths):
                f.write(f"{item}\n")
    assert len(train_scenes + val_scenes + test_scenes) == len(all_scenes)
    assert not set(train_scenes) & set(val_scenes)
    assert not set(train_scenes) & set(test_scenes)
    assert not set(val_scenes) & set(test_scenes)
    fprint("Created new train/val/test splits!")


def load(cfg, **unused_kwargs):
    del unused_kwargs
    if not os.path.exists(cfg.data_folder):
        raise FileNotFoundError(
            f"Data folder does not exist: {cfg.data_folder}")
    assert cfg.img_size == 128

    modes = ["train", "val", "test"]
    if any(not osp.exists(f"{cfg.data_folder}/{m}_images.txt")
           for m in modes):
        _create_splits(cfg.data_folder)

    split_paths = {}
    for m in modes:
        with open(f"{cfg.data_folder}/{m}_images.txt") as f:
            split_paths[m] = [line.strip() for line in f if line.strip()]
        fprint(f"{len(split_paths[m])} {m} images")

    seed = cfg.get("seed", 0)
    loaders = tuple(
        DataLoader(APCDataset(split_paths[m]), cfg.batch_size,
                   shuffle=True, seed=seed + i)
        for i, m in enumerate(modes))
    if not cfg.get("debug", False):
        loader_throughput(loaders[0])
    return loaders


def preprocess(data_folder: str = "data/apc", img_size: int = 128):
    """Resize + centre-crop the raw APC data to 128x128 PNGs
    (apc_config.py:139-169)."""
    from PIL import Image

    def _resize_crop(img: "Image.Image", resample) -> "Image.Image":
        w, h = img.size
        scale = img_size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), resample)
        w, h = img.size
        left, top = (w - img_size) // 2, (h - img_size) // 2
        return img.crop((left, top, left + img_size, top + img_size))

    print("Getting image paths...")
    image_paths = glob(
        f"{data_folder}/training/*/*/scene-*/frame-*.color.png")
    print(f"Done. Found {len(image_paths)}.")
    print("Creating folders...")
    for path in glob(f"{data_folder}/training/*/*/scene-*/"):
        os.makedirs(path.replace("training", "processed"), exist_ok=True)
        os.makedirs(path.replace("training", "processed") + "/masks",
                    exist_ok=True)
    print("Preprocessing images...")
    for path in image_paths:
        img = _resize_crop(Image.open(path), Image.BILINEAR)
        img.save(path.replace("training", "processed"))
        if "scene-empty" not in path:
            m_path = path.replace("frame", "masks/frame").replace(
                "color", "mask")
            mask = _resize_crop(Image.open(m_path), Image.NEAREST)
            mask.save(m_path.replace("training", "processed"))
    print("ALL DONE!")


if __name__ == "__main__":
    preprocess()
