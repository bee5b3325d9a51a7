"""Misc utilities (reference utils/misc.py re-expressed for JAX/NHWC).

Host-side helpers (loader throughput, mask checking, colouring) plus the
numerics used across models. The heavy metrics (ARI/MSC) live in
eval/metrics.py as vectorised jnp.
"""

import time
from typing import List, Optional

import numpy as np

from genesis_tpu.core.experiment import fprint

_PALETTE_15 = [
    [0, 0, 0], [230, 25, 75], [60, 180, 75], [255, 225, 25],
    [0, 130, 200], [245, 130, 48], [145, 30, 180], [70, 240, 240],
    [240, 50, 230], [210, 245, 60], [250, 190, 190], [0, 128, 128],
    [230, 190, 255], [170, 110, 40], [255, 250, 200],
]


def loader_throughput(loader, num_batches: int = 100,
                      burn_in: Optional[int] = 5):
    """Startup loader benchmark (reference utils/misc.py:58-74)."""
    assert num_batches > 0
    if burn_in is None:
        burn_in = num_batches // 10
    num_samples = 0
    fprint(f"Train loader throughput stats on {num_batches} batches...")
    timer = None
    for i, batch in enumerate(loader):
        if i == burn_in:
            timer = time.time()
        if i >= burn_in:
            num_samples += batch["input"].shape[0]
        if i == num_batches + burn_in:
            break
    if timer is None:  # loader shorter than burn-in
        fprint("Loader too short for throughput stats")
        return
    dt = max(time.time() - timer, 1e-9)
    spb = dt / num_batches
    ips = num_samples / dt
    fprint(f"{spb:.3f} s/b, {ips:.1f} im/s")


def np_img_centre_crop(np_img: np.ndarray, crop_dim: int,
                       batch: bool = False) -> np.ndarray:
    """Centre crop NHWC (or HWC) numpy images
    (reference utils/misc.py:45-55, NCHW there)."""
    if batch:
        h, w = np_img.shape[1], np_img.shape[2]
        s1 = (h - crop_dim) // 2
        s2 = (w - crop_dim) // 2
        return np_img[:, s1:s1 + crop_dim, s2:s2 + crop_dim, :]
    h, w = np_img.shape[0], np_img.shape[1]
    s1 = (h - crop_dim) // 2
    s2 = (w - crop_dim) // 2
    return np_img[s1:s1 + crop_dim, s2:s2 + crop_dim, :]


def check_log_masks(log_m_k: np.ndarray, tol: float = 1e-3):
    """Assert slot masks sum to one (reference utils/misc.py:258-270).

    log_m_k: [K, B, H, W, 1] (numpy or jax array, pulled to host).
    """
    summed = np.asarray(np.exp(np.asarray(log_m_k)).sum(axis=0))
    flat = summed.flatten()
    diff = flat - 1.0
    idx = int(np.argmax(diff))
    max_diff = diff[idx]
    if max_diff > tol or np.any(np.isnan(flat)):
        print(f"Max difference: {max_diff}")
        for i in range(log_m_k.shape[0]):
            mask_k = np.exp(np.asarray(log_m_k[i])).flatten()
            print(f"Mask value at k={i}: {mask_k[idx]}")
        raise ValueError("Masks do not sum to 1.0. Not close enough.")


def colour_seg_masks(masks: np.ndarray,
                     palette: Optional[List[List[int]]] = None
                     ) -> np.ndarray:
    """Map int label maps [B, H, W] (or [B,H,W,1]) to RGB uint8-valued
    float arrays [B, H, W, 3]; negative (ignore) labels map to black
    (reference utils/misc.py:82-98)."""
    if palette is None:
        palette = _PALETTE_15
    if masks.ndim == 4:
        masks = masks[..., 0]
    masks = np.asarray(masks)
    out = np.zeros(masks.shape + (3,), np.float32)
    for c_idx in range(int(masks.max()) + 1 if masks.size else 0):
        c_map = masks == c_idx
        if c_map.any():
            out[c_map] = np.asarray(
                palette[c_idx % len(palette)], np.float32)
    return out


def make_grid(images: np.ndarray, nrow: int = 8,
              padding: int = 2) -> np.ndarray:
    """Tile a batch [B,H,W,C] into one image grid (torchvision make_grid
    equivalent for TB logging, reference train.py:24)."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    ncol = (b + nrow - 1) // nrow
    grid = np.zeros((ncol * (h + padding) + padding,
                     nrow * (w + padding) + padding, c), images.dtype)
    for i in range(b):
        r, col = divmod(i, nrow)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid
