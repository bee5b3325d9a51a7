"""Plotting helpers (reference utils/plotting.py:18-37).

Matplotlib subplot helper for decomposition figures; NHWC arrays in,
figures saved or shown depending on the backend.
"""

import numpy as np


def convert_to_np_im(tensor, batch_idx: int = 0) -> np.ndarray:
    """Select one NHWC image from a batch as a numpy array."""
    return np.asarray(tensor)[batch_idx]


def plot(axes, row: int, col: int, img=None, title=None, batch_idx: int = 0,
         fontsize: int = 6):
    """Draw one cell of a decomposition grid."""
    ax = axes[row, col] if hasattr(axes, "ndim") and axes.ndim == 2 \
        else axes[max(row, col)]
    ax.axis("off")
    if img is not None:
        im = convert_to_np_im(img, batch_idx)
        if im.shape[-1] == 1:
            im = np.repeat(im, 3, axis=-1)
        ax.imshow(np.clip(im, 0.0, 1.0))
    if title is not None:
        ax.set_title(title, fontsize=fontsize)
