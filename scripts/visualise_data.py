#!/usr/bin/env python
"""Visualise dataset batches + coloured GT instance maps
(reference scripts/visualise_data.py).

Saves figures to --out_dir (headless-friendly) instead of plt.show().
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from genesis_tpu import core
from genesis_tpu.core import flags
from genesis_tpu.utils.misc import colour_seg_masks


def main_flags():
    flags.DEFINE_string("data_config",
                        "genesis_tpu/data/synthetic_config.py",
                        "Path to a data config file.")
    flags.DEFINE_string("model_config", "",
                        "Unused; accepted for CLI parity.")
    flags.DEFINE_integer("batch_size", 8, "Mini-batch size.")
    flags.DEFINE_integer("num_batches", 2, "Batches to visualise.")
    flags.DEFINE_string("out_dir", "visualisations", "Output directory.")
    flags.DEFINE_boolean("debug", True, "Debug flag (skips throughput).")
    flags.DEFINE_integer("seed", 0, "Seed.")


def main():
    cfg = core.config()
    from genesis_tpu.core import experiment as fet
    train_loader, _, _ = fet.load(cfg.data_config, cfg)
    os.makedirs(cfg.out_dir, exist_ok=True)
    for b_idx, batch in enumerate(train_loader):
        if b_idx >= cfg.num_batches:
            break
        from genesis_tpu.data.loader import prepare_input
        imgs = np.asarray(prepare_input(batch["input"]))
        has_ins = "instances" in batch
        rows = 2 if has_ins else 1
        fig, axes = plt.subplots(rows, len(imgs),
                                 figsize=(2 * len(imgs), 2 * rows),
                                 squeeze=False)
        for i in range(len(imgs)):
            axes[0, i].imshow(np.clip(imgs[i], 0, 1))
            axes[0, i].axis("off")
            if has_ins:
                coloured = colour_seg_masks(
                    batch["instances"][i:i + 1])[0] / 255.0
                axes[1, i].imshow(coloured)
                axes[1, i].axis("off")
        out = osp.join(cfg.out_dir, f"data_batch{b_idx}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"Saved {out}")


if __name__ == "__main__":
    main_flags()
    main()
