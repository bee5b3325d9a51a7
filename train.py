#!/usr/bin/env python
"""Training CLI (reference train.py).

Usage mirrors the reference exactly:
  python train.py --data_config genesis_tpu/data/multid_config.py \
                  --model_config genesis_tpu/models/genesis_config.py

All flags declared here + by the two config files are parseable; run dirs
and flags.json round-trip through genesis_tpu.core.experiment.
"""

import random

import numpy as np

from genesis_tpu import core
from genesis_tpu.core import flags


def main_flags():
    # Data & model config (reference train.py:45-50)
    flags.DEFINE_string("data_config",
                        "genesis_tpu/data/multid_config.py",
                        "Path to a data config file.")
    flags.DEFINE_string("model_config",
                        "genesis_tpu/models/genesis_config.py",
                        "Path to a model config file.")
    # Logging config (train.py:51-68)
    flags.DEFINE_string("results_dir", "checkpoints",
                        "Top directory for all experimental results.")
    flags.DEFINE_string("run_name", "test",
                        "Name of this job / results folder.")
    flags.DEFINE_integer("report_loss_every", 1000,
                         "Iterations between heartbeat loss reports.")
    flags.DEFINE_integer("run_validation_every", 5000,
                         "Iterations between validation runs.")
    flags.DEFINE_integer("log_images_every", 25000,
                         "Iterations between image logging.")
    flags.DEFINE_integer("num_checkpoints", 4,
                         "Number of equally spaced checkpoints.")
    flags.DEFINE_boolean("resume", False, "Resume a job if True.")
    flags.DEFINE_boolean("log_grads_and_weights", False,
                         "Log gradient/weight histograms (storage heavy).")
    flags.DEFINE_boolean("log_distributions", False,
                         "Log posterior/prior mu and sigma histograms.")
    # Optimisation config (train.py:69-76)
    flags.DEFINE_integer("train_iter", 500000,
                         "Number of training iterations.")
    flags.DEFINE_integer("batch_size", 32, "Mini-batch size.")
    flags.DEFINE_string("optimiser", "adam", "adam | rmsprop | sgd.")
    flags.DEFINE_float("learning_rate", 0.0001, "Learning rate.")
    flags.DEFINE_integer("N_eval", 10000,
                         "Number of samples to run evaluation on.")
    flags.DEFINE_integer("num_fid_images", 10000,
                         "Images for the end-of-training FID stage.")
    # Loss config (train.py:77-86)
    flags.DEFINE_float("beta", 0.5, "KL weighting.")
    flags.DEFINE_boolean("beta_warmup", False, "Warm up beta.")
    flags.DEFINE_boolean("geco", True, "Use GECO objective.")
    flags.DEFINE_float("g_goal", 0.5655, "GECO recon goal.")
    flags.DEFINE_float("g_lr", 1e-5, "GECO learning rate.")
    flags.DEFINE_float("g_alpha", 0.99, "GECO EMA momentum for error.")
    flags.DEFINE_float("g_init", 1.0, "GECO initial Lagrange factor.")
    flags.DEFINE_float("g_min", 1e-10, "GECO min Lagrange factor.")
    flags.DEFINE_float("g_speedup", 10., "Scale GECO lr if delta positive.")
    # Other (train.py:87-91)
    flags.DEFINE_integer("model_parallel", 1,
                         "Model-parallel mesh axis size.")
    flags.DEFINE_boolean("device_dataset", False,
                         "Keep the whole train split resident in device "
                         "memory and gather batches by index on device "
                         "(splits that fit in HBM; removes the per-step "
                         "host->device batch transfer).")
    flags.DEFINE_boolean("debug", False, "Debug flag.")
    flags.DEFINE_boolean("debug_nans", False,
                         "Enable jax_debug_nans NaN detection.")
    flags.DEFINE_string("profile_dir", "",
                        "If set, capture a jax.profiler trace of steps "
                        "10-20 into this directory.")
    flags.DEFINE_integer("seed", 0, "Seed for random number generators.")


def main():
    config = core.config()

    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax(debug_nans=config.get("debug_nans", False))

    # Fix host-side seeds; device-side randomness is keyed from cfg.seed.
    np.random.seed(config.seed)
    random.seed(config.seed)

    from genesis_tpu.parallel import init_distributed
    init_distributed()

    from genesis_tpu.train.loop import train
    train(config)


if __name__ == "__main__":
    main_flags()
    main()
