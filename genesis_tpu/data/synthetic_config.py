"""Synthetic multi-sprites data config — CPU-generated, no files needed.

Same flag surface as datasets/multid_config.py in the reference so the
trainer CLI is interchangeable; intended for smoke runs, tests and
benchmarking.
"""

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.data.loader import ArrayDataset, DataLoader
from genesis_tpu.data import synthetic
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_integer("img_size", 64, "Dimension of images (square).")
flags.DEFINE_integer("K_steps", 5, "Number of recurrent steps.")
flags.DEFINE_boolean("load_instances", True, "Load instances.")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_integer("synth_train_size", 2048, "Synthetic train images.")
flags.DEFINE_integer("synth_eval_size", 256, "Synthetic val/test images.")
flags.DEFINE_integer("synth_max_sprites", 4, "Max sprites per image.")


def load(cfg, **unused_kwargs):
    del unused_kwargs
    img = cfg.img_size
    k = cfg.get("synth_max_sprites", 4)
    with_ins = cfg.get("load_instances", True)
    splits = []
    for split_idx, n in enumerate([cfg.get("synth_train_size", 2048),
                                   cfg.get("synth_eval_size", 256),
                                   cfg.get("synth_eval_size", 256)]):
        arrays = synthetic.generate_dataset(
            n, img, k, seed=100 + split_idx, with_instances=with_ins)
        # Ship uint8 over host->device (prepare_input restores f32).
        arrays["input"] = np.round(arrays["input"] * 255).astype(np.uint8)
        ds = ArrayDataset(arrays)
        splits.append(DataLoader(ds, cfg.batch_size, shuffle=True,
                                 seed=cfg.get("seed", 0) + split_idx))
    if not cfg.get("debug", False):
        loader_throughput(splits[0])
    return tuple(splits)
