#!/usr/bin/env python
"""Per-slot reconstruction grids for a trained model
(reference scripts/visualise_reconstruction.py): rows = input, recon,
then per-slot masked appearance (mx), raw appearance (x), mask, scope.
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
    flags.DEFINE_integer("batch_size", 4, "Images to visualise.")
    flags.DEFINE_string("out_dir", "visualisations", "Output directory.")
    flags.DEFINE_boolean("debug", True, "Debug flag.")
    flags.DEFINE_integer("seed", 0, "Seed.")


def main():
    cfg = core.config()
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from genesis_tpu.eval.restore import load_pretrained

    model, state, pretrained, loaders = load_pretrained(
        cfg.model_dir, cfg.model_file, cfg)
    from genesis_tpu.data.loader import prepare_input
    batch = next(iter(loaders[2]))
    x = prepare_input(jnp.asarray(batch["input"][:cfg.batch_size]))
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    recon, losses, stats, _, _ = model.apply(
        variables, x, False, rngs={"sample": jax.random.PRNGKey(cfg.seed)})

    os.makedirs(cfg.out_dir, exist_ok=True)
    K = stats["log_m_k"].shape[0]
    for b in range(x.shape[0]):
        cols = 2 + K
        rows = 5
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(1.6 * cols, 1.6 * rows),
                                 squeeze=False)
        for ax_row in axes:
            for ax in ax_row:
                ax.axis("off")
        axes[0, 0].imshow(np.clip(np.asarray(x[b]), 0, 1))
        axes[0, 0].set_title("input", fontsize=6)
        axes[0, 1].imshow(np.clip(np.asarray(recon[b]), 0, 1))
        axes[0, 1].set_title("recon", fontsize=6)
        # The mask row must match the mx row: reconstructed masks when
        # the model has them (GENESIS-V2/MONet), else attention masks
        # (reference visualise_reconstruction.py model-dependent field).
        mask_field = "log_m_r_k" if "log_m_r_k" in stats else "log_m_k"
        names_fields = [("mx", "mx_r_k"), ("x", "x_r_k"),
                        ("mask", mask_field), ("att", "log_m_k"),
                        ("scope", "log_s_k")]
        for r, (name, field) in enumerate(names_fields):
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
                axes[r, 2 + k].imshow(np.clip(im, 0, 1))
                axes[r, 2 + k].set_title(f"{name} k={k}", fontsize=6)
        out = osp.join(cfg.out_dir, f"recon_{b}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"Saved {out}")


if __name__ == "__main__":
    main_flags()
    main()
