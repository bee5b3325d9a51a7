#!/usr/bin/env python
"""Post-hoc FID evaluation CLI (reference scripts/compute_fid.py).

  python scripts/compute_fid.py --model_dir checkpoints/test/1 \
      --data_config genesis_tpu/data/gqn_config.py \
      --model_config genesis_tpu/models/genesis_config.py

Restores flags + checkpoint of a trained run and computes FID between
num_fid_images test images and model samples. Features are computed
directly from device tensors (no 20k-PNG round trip); pass --img_dir to
additionally dump PNGs for the reference's on-disk protocol.
"""

import os.path as osp
import random
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from genesis_tpu import core
from genesis_tpu.core import flags
from genesis_tpu.core import experiment as fet


def main_flags():
    flags.DEFINE_string("data_config",
                        "genesis_tpu/data/gqn_config.py",
                        "Path to a data config file.")
    flags.DEFINE_string("model_config",
                        "genesis_tpu/models/genesis_config.py",
                        "Path to a model config file.")
    flags.DEFINE_string("model_dir", "checkpoints/test/1",
                        "Path to model directory.")
    flags.DEFINE_string("model_file", "model.ckpt-FINAL",
                        "Name of model file.")
    flags.DEFINE_integer("feat_dim", 2048, "Number of Inception features.")
    flags.DEFINE_integer("num_fid_images", 10000,
                         "Number of images to compute the FID on.")
    flags.DEFINE_string("img_dir", "",
                        "Optional directory for PNG dumps.")
    flags.DEFINE_string("fid_extractor", "auto",
                        "auto | inception | random.")
    flags.DEFINE_integer("batch_size", 10, "Mini-batch size.")
    flags.DEFINE_boolean("debug", False, "Debug flag.")
    flags.DEFINE_integer("seed", 0, "Seed for random number generators.")


def main():
    cfg = core.config()
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    fet.EXPERIMENT_FOLDER = cfg.model_dir
    fet.FPRINT_FILE = "fid_evaluation.txt"
    np.random.seed(cfg.seed)
    random.seed(cfg.seed)

    from genesis_tpu.eval.restore import load_pretrained
    from genesis_tpu.eval.fid import fid_from_model

    model, state, pretrained, (train_l, val_l, test_l) = load_pretrained(
        cfg.model_dir, cfg.model_file, cfg)

    num_images = cfg.num_fid_images if not cfg.debug else 10
    fid_from_model(model, state, test_l,
                   batch_size=cfg.batch_size,
                   num_images=num_images,
                   feat_dim=cfg.feat_dim,
                   img_dir=cfg.img_dir or None,
                   extractor_kind=cfg.fid_extractor,
                   seed=cfg.seed)


if __name__ == "__main__":
    main_flags()
    main()
