#!/usr/bin/env python
"""Generate the processed Multi-dSprites dataset
(reference scripts/generate_multid.py).

Composites 1-4 dSprites sprite masks over a coloured background with
colours snapped to a {0,63,127,191,255} grid, writing
{training,validation,test}_{images,masks}_rand4[_unique].npy splits of
50k/10k/10k.

Requires the public dsprites npz
(dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz). If it is absent (this
container has no network egress), pass --procedural to composite
procedurally generated sprite masks with the same scene statistics
instead — the pipeline and file format are identical.
"""

import argparse
import os
import os.path as osp
import random
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def rand_rgb_tuple(rng: random.Random):
    val = [0, 63, 127, 191, 255]
    return rng.choice(val), rng.choice(val), rng.choice(val)


def _procedural_sprites(num: int, seed: int = 0) -> np.ndarray:
    """Binary 64x64 sprite masks (ellipse/square/heart-ish shapes at
    random scale/position), standing in for the dsprites imgs array."""
    rs = np.random.RandomState(seed)
    sprites = np.zeros((num, 64, 64), bool)
    yy, xx = np.mgrid[0:64, 0:64]
    for i in range(num):
        kind = rs.randint(3)
        size = rs.randint(5, 15)
        cy, cx = rs.randint(size, 64 - size, size=2)
        if kind == 0:
            m = (np.abs(yy - cy) <= size) & (np.abs(xx - cx) <= size // 2)
        elif kind == 1:
            m = ((yy - cy) ** 2 / size ** 2 +
                 (xx - cx) ** 2 / (size / 2) ** 2) <= 1
        else:
            m = (yy >= cy - size) & (yy <= cy) & \
                (np.abs(xx - cx) <= (yy - (cy - size)) // 2)
        sprites[i] = m
    return sprites


def generate(sprites, dataset_size, num_objects=None, unique=False,
             rng=None):
    rng = rng or random.Random(0)
    # uint8/int32 buffers: the float64 equivalents would be ~6.5GB for
    # the default 50k split. The loader normalises uint8 on device.
    all_images = np.zeros((dataset_size, 64, 64, 3), np.uint8)
    all_instance_masks = np.zeros((dataset_size, 64, 64, 1), np.int32)
    n_sprites = len(sprites)
    for i in range(dataset_size):
        if (i + 1) % 10000 == 0:
            print(f"Processing [{i + 1} | {dataset_size}]")
        background_colour = rand_rgb_tuple(rng)
        image = np.empty((64, 64, 3), np.uint8)
        image[:] = background_colour
        instance_masks = np.zeros((64, 64, 1), int)
        img_colours = [background_colour]
        num = rng.randint(1, 4) if num_objects is None else num_objects
        for obj_idx in range(num):
            sprite_mask = np.asarray(
                sprites[rng.randint(0, n_sprites - 1)], bool)
            crop_index = np.where(sprite_mask)
            object_colour = rand_rgb_tuple(rng)
            while unique and object_colour in img_colours:
                object_colour = rand_rgb_tuple(rng)
            image[crop_index] = object_colour
            instance_masks[crop_index] = obj_idx + 1
            img_colours.append(object_colour)
        all_images[i] = image
        all_instance_masks[i] = instance_masks
    return all_images, all_instance_masks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default="data/multi_dsprites")
    p.add_argument("--procedural", action="store_true",
                   help="Use procedural sprites instead of dsprites npz.")
    p.add_argument("--train_size", type=int, default=50000)
    p.add_argument("--eval_size", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    random.seed(args.seed)
    np.random.seed(args.seed)

    npz_path = osp.join(
        args.data_folder, "dsprites-dataset",
        "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz")
    if args.procedural or not osp.exists(npz_path):
        if not args.procedural:
            print(f"WARNING: {npz_path} not found; using procedural "
                  "sprites (--procedural).")
        sprites = _procedural_sprites(10000, args.seed)
    else:
        sprites = np.load(npz_path, encoding="latin1")["imgs"]

    out_dir = osp.join(args.data_folder, "processed")
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(args.seed)
    for unique, suffix in ((False, ""), (True, "_unique")):
        for split, size in (("training", args.train_size),
                            ("validation", args.eval_size),
                            ("test", args.eval_size)):
            print(f"Generate {split} images (unique={unique})...")
            images, masks = generate(sprites, size, unique=unique, rng=rng)
            np.save(osp.join(out_dir, f"{split}_images_rand4{suffix}.npy"),
                    images)
            np.save(osp.join(out_dir, f"{split}_masks_rand4{suffix}.npy"),
                    masks)
    print("Done!")


if __name__ == "__main__":
    main()
