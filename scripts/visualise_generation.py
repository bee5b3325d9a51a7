#!/usr/bin/env python
"""Per-slot generation grids for a trained model
(reference scripts/visualise_generation.py): ancestral samples with
their per-slot appearances and masks.
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


def main_flags():
    flags.DEFINE_string("data_config",
                        "genesis_tpu/data/synthetic_config.py",
                        "Path to a data config file.")
    flags.DEFINE_string("model_config",
                        "genesis_tpu/models/genesisv2_config.py",
                        "Path to a model config file.")
    flags.DEFINE_string("model_dir", "checkpoints/test/1",
                        "Path to model directory.")
    flags.DEFINE_string("model_file", "model.ckpt-FINAL",
                        "Name of model file.")
    flags.DEFINE_integer("batch_size", 4, "Samples to draw.")
    flags.DEFINE_string("out_dir", "visualisations", "Output directory.")
    flags.DEFINE_boolean("debug", True, "Debug flag.")
    flags.DEFINE_integer("seed", 0, "Seed.")


def main():
    cfg = core.config()
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax
    from genesis_tpu.eval.restore import load_pretrained

    model, state, pretrained, _ = load_pretrained(
        cfg.model_dir, cfg.model_file, cfg)
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    gen, stats = model.apply(
        variables, cfg.batch_size,
        rngs={"sample": jax.random.PRNGKey(cfg.seed)},
        method=model.sample)

    os.makedirs(cfg.out_dir, exist_ok=True)
    K = stats["log_m_k"].shape[0]
    for b in range(cfg.batch_size):
        cols = 1 + K
        rows = 4
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(1.6 * cols, 1.6 * rows),
                                 squeeze=False)
        for ax_row in axes:
            for ax in ax_row:
                ax.axis("off")
        axes[0, 0].imshow(np.clip(np.asarray(gen[b]), 0, 1))
        axes[0, 0].set_title("sample", fontsize=6)
        for r, (name, field) in enumerate(
                [("mx", "mx_k"), ("x", "x_k"), ("mask", "log_m_k"),
                 ("scope", "log_s_k")]):
            if field not in stats:
                continue
            val = stats[field]
            if "log" in field:
                val = np.exp(np.asarray(val))
            else:
                val = np.asarray(val)
            for k in range(min(K, val.shape[0])):
                im = val[k, b]
                if im.shape[-1] == 1:
                    im = np.repeat(im, 3, axis=-1)
                axes[r, 1 + k].imshow(np.clip(im, 0, 1))
                axes[r, 1 + k].set_title(f"{name} k={k}", fontsize=6)
        out = osp.join(cfg.out_dir, f"gen_{b}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"Saved {out}")


if __name__ == "__main__":
    main_flags()
    main()
