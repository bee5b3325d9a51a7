#!/usr/bin/env python
"""Segmentation-metrics CLI (reference scripts/compute_seg_metrics.py).

Evaluates ARI-FG and MSC-FG on attention masks (log_m_k) and
reconstructed masks (log_m_r_k) over `num_images` images. The metric
math runs vectorised on device (eval/metrics.py) instead of the
reference's per-image sklearn loop at batch_size 1.
"""

import os.path as osp
import random
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from genesis_tpu import core
from genesis_tpu.core import flags
from genesis_tpu.core import experiment as fet
from genesis_tpu.core.experiment import fprint


def main_flags():
    flags.DEFINE_string("data_config",
                        "genesis_tpu/data/multi_object_config.py",
                        "Path to a data config file.")
    flags.DEFINE_string("model_config",
                        "genesis_tpu/models/genesisv2_config.py",
                        "Path to a model config file.")
    flags.DEFINE_string("model_dir", "checkpoints/test/1",
                        "Path to model directory.")
    flags.DEFINE_string("model_file", "model.ckpt-FINAL",
                        "Name of model file.")
    flags.DEFINE_integer("num_images", 320,
                         "Number of images to evaluate on.")
    flags.DEFINE_string("split", "test", "{train, val, test}")
    flags.DEFINE_integer("batch_size", 16, "Mini-batch size.")
    flags.DEFINE_boolean("debug", False, "Debug flag.")
    flags.DEFINE_integer("seed", 0, "Seed for random number generators.")


def main():
    cfg = core.config()
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    fet.EXPERIMENT_FOLDER = cfg.model_dir
    fet.FPRINT_FILE = "seg_metrics.txt"
    np.random.seed(cfg.seed)
    random.seed(cfg.seed)

    import jax
    import jax.numpy as jnp
    from genesis_tpu.eval import metrics as M
    from genesis_tpu.eval.restore import load_pretrained

    # Force instance loading regardless of the training flags
    # (reference compute_seg_metrics.py sets config.load_instances=True).
    model, state, pretrained, loaders = load_pretrained(
        cfg.model_dir, cfg.model_file, cfg,
        force_flags={"load_instances": True})
    loader = dict(zip(("train", "val", "test"), loaders))[cfg.split]

    from genesis_tpu.data.loader import prepare_input

    @jax.jit
    def seg_step(state, batch, key):
        batch = dict(batch)
        batch["input"] = prepare_input(batch["input"])
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        _, _, stats, _, _ = model.apply(
            variables, batch["input"], False, rngs={"sample": key})
        gt = batch["instances"]
        if gt.ndim == 4:
            gt = gt[..., 0]
        out = {}
        for mode, suffix in (("log_m_k", ""), ("log_m_r_k", "_r")):
            if mode not in stats:
                continue
            pred = M.masks_to_segmentation(stats[mode])
            out["ari_fg" + suffix] = M.adjusted_rand_index(
                pred, gt, stats[mode].shape[0], fg_only=True)
            # Reference CLI reports the MEAN covering variant — the first
            # return of average_segcover (compute_seg_metrics.py:117,
            # utils/misc.py:224-235) — not the area-scaled second return.
            msc_fg, _ = M.segmentation_covering(
                gt, pred, stats[mode].shape[0], ignore_background=True)
            out["msc_fg" + suffix] = msc_fg
            # Full-frame variants (beyond the reference CLI, which only
            # emits FG): the published APC row (README.md:174) quotes
            # full-frame ARI/MSC, so report them under the same protocol.
            out["ari" + suffix] = M.adjusted_rand_index(
                pred, gt, stats[mode].shape[0], fg_only=False)
            msc, _ = M.segmentation_covering(
                gt, pred, stats[mode].shape[0], ignore_background=False)
            out["msc" + suffix] = msc
        return out

    num_images = cfg.num_images if not cfg.debug else 8
    totals, count = {}, 0
    key = jax.random.PRNGKey(cfg.seed)
    for batch in loader:
        if count >= num_images:
            break
        if "instances" not in batch:
            fprint("Dataset has no instance labels; aborting.")
            return
        key, sub = jax.random.split(key)
        out = seg_step(state, {k: jnp.asarray(v) for k, v in
                               batch.items()}, sub)
        take = min(num_images - count, batch["input"].shape[0])
        for k, v in out.items():
            vals = np.asarray(v)[:take]
            totals.setdefault(k, []).extend(vals.tolist())
        count += take
        fprint(f"[{count}/{num_images}] " + " ".join(
            f"{k}: {np.mean(vs):.4f}" for k, vs in sorted(totals.items())))

    fprint("FINAL (n={}):".format(count), True)
    for k, vs in sorted(totals.items()):
        fprint(f"  {k}: {np.mean(vs):.4f}", True)


if __name__ == "__main__":
    main_flags()
    main()
