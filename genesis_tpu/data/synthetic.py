"""Procedural multi-sprite scene generator.

Generates Multi-dSprites-like scenes (coloured sprites on a coloured
background with instance masks) fully in numpy — used by the synthetic
data config, the test suite, and bench.py so the whole stack runs without
downloaded datasets. The layout/statistics mirror
scripts/generate_multid.py in the reference (64x64 RGB, background + 1-4
sprites, colours from a 5^3 grid, occlusion by paint order, instance
labels with background = 0).
"""

from typing import Tuple

import numpy as np


def _rand_rgb(rs: np.random.RandomState) -> np.ndarray:
    # Colours snapped to a 5-level grid per channel (generate_multid.py
    # rand_rgb_tuple semantics).
    return rs.randint(0, 5, size=3).astype(np.float32) / 4.0


def _draw_sprite(canvas, instances, label, rs):
    h, w, _ = canvas.shape
    shape = rs.randint(3)  # 0=square, 1=ellipse, 2=triangle
    size = rs.randint(h // 8, h // 3)
    cy = rs.randint(size, h - size)
    cx = rs.randint(size, w - size)
    colour = _rand_rgb(rs)
    yy, xx = np.mgrid[0:h, 0:w]
    if shape == 0:
        mask = (np.abs(yy - cy) <= size // 2) & (np.abs(xx - cx) <= size // 2)
    elif shape == 1:
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) <= (size // 2) ** 2
    else:
        mask = (yy >= cy - size // 2) & (yy <= cy + size // 2) & \
               (np.abs(xx - cx) <= (yy - (cy - size // 2)) // 2 + 1)
    canvas[mask] = colour
    instances[mask] = label


def generate_scene(rs: np.random.RandomState, img_size: int = 64,
                   max_sprites: int = 4
                   ) -> Tuple[np.ndarray, np.ndarray]:
    canvas = np.empty((img_size, img_size, 3), np.float32)
    canvas[:] = _rand_rgb(rs)
    instances = np.zeros((img_size, img_size), np.int32)
    n = rs.randint(1, max_sprites + 1)
    for i in range(n):
        _draw_sprite(canvas, instances, i + 1, rs)
    return canvas, instances


def generate_dataset(num_images: int, img_size: int = 64,
                     max_sprites: int = 4, seed: int = 0,
                     with_instances: bool = True):
    rs = np.random.RandomState(seed)
    images = np.empty((num_images, img_size, img_size, 3), np.float32)
    instances = np.empty((num_images, img_size, img_size, 1), np.int32)
    for i in range(num_images):
        img, ins = generate_scene(rs, img_size, max_sprites)
        images[i] = img
        instances[i, ..., 0] = ins
    out = {"input": images}
    if with_instances:
        out["instances"] = instances
    return out
