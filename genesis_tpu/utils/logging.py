"""Scalar/image logging: JSONL always, TensorBoard when available.

The reference logs through tensorboardX (train.py:28,144-145). We write a
machine-readable scalars.jsonl in the run dir unconditionally and mirror to
TensorBoard if a writer backend is importable.
"""

import json
import os.path as osp
from typing import Dict

import numpy as np


class MetricsLogger:
    def __init__(self, logdir: str):
        self.logdir = logdir
        self.jsonl_path = osp.join(logdir, "scalars.jsonl")
        self.tb = None
        for mod in ("tensorboardX", "torch.utils.tensorboard"):
            try:
                import importlib
                tb_mod = importlib.import_module(mod)
                self.tb = tb_mod.SummaryWriter(logdir)
                break
            except Exception:
                continue

    def log_scalars(self, scalars: Dict[str, float], tag: str, step: int):
        row = {"step": int(step), "tag": tag}
        for key, val in scalars.items():
            row[key] = float(np.asarray(val))
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.tb is not None:
            for key, val in scalars.items():
                self.tb.add_scalar(f"{tag}/{key}", float(np.asarray(val)),
                                   step)

    def log_image(self, name: str, image: np.ndarray, step: int):
        """image: [H, W, C] float in [0,1]. Saved as PNG in the run dir
        (and to TB if present)."""
        img8 = np.clip(np.asarray(image) * 255, 0, 255).astype(np.uint8)
        if img8.shape[-1] == 1:
            img8 = np.repeat(img8, 3, axis=-1)
        try:
            from PIL import Image
            imgdir = osp.join(self.logdir, "images")
            import os
            os.makedirs(imgdir, exist_ok=True)
            Image.fromarray(img8).save(
                osp.join(imgdir, f"{name.replace('/', '_')}_{step}.png"))
        except ImportError:
            pass
        if self.tb is not None:
            self.tb.add_image(name, img8, step, dataformats="HWC")

    def log_histogram(self, name: str, values, step: int):
        if self.tb is not None:
            self.tb.add_histogram(name, np.asarray(values), step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
