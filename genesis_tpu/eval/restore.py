"""Restore a trained model from a run directory for evaluation CLIs.

Mirrors the reference's eval-script restore flow
(scripts/compute_fid.py:76-94): hyperparameters come from the run's
flags.json (config round-tripping is part of the checkpoint contract),
the model is built through its config file, and the checkpoint restores
into a freshly initialised state template.
"""

import os.path as osp

import jax

from genesis_tpu.core import experiment as fet
from genesis_tpu.core import flagparse
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.core.experiment import fprint, json_load
from genesis_tpu.train import checkpoint as ckpt_lib
from genesis_tpu.train.state import create_train_state


def load_pretrained(model_dir: str, model_file: str, cfg,
                    force_flags=None, user_set=None):
    """Returns (model, state, pretrained_flags, loaders).

    `cfg` supplies the *eval-time* data settings (batch size etc.); the
    model hyperparameters are restored from `<model_dir>/flags.json`.
    `force_flags` overrides individual pretrained flags (e.g. the
    seg-metrics CLI forces load_instances=True like the reference).
    `user_set` names the flags the caller set explicitly (defaults to the
    set recorded by flagparse when `cfg` came from the command line);
    cfg's data_config/model_config only override the pretrained run's
    flags.json when they are in this set.
    """
    if user_set is None:
        user_set = flagparse.user_set(cfg)
    flag_path = osp.join(model_dir, "flags.json")
    fprint(f"Restoring flags from {flag_path}")
    pretrained = AttrDict(json_load(flag_path))
    # Eval-time overrides (reference passes the live config to the data
    # loader but the pretrained flags to the model).
    pretrained.batch_size = cfg.get("batch_size", 10)
    pretrained.debug = cfg.get("debug", False)
    if "seed" in cfg:
        pretrained.seed = cfg.seed
    if force_flags:
        pretrained.update(force_flags)

    # Config round-tripping: when the caller didn't set
    # --model_config/--data_config explicitly, build from the configs
    # recorded in the run's flags.json rather than the CLI defaults —
    # `--model_dir` alone restores any model/data family correctly.
    data_config, model_config = cfg.data_config, cfg.model_config
    if "data_config" not in user_set and pretrained.get("data_config"):
        data_config = pretrained.data_config
    if "model_config" not in user_set and pretrained.get("model_config"):
        model_config = pretrained.model_config
    if (data_config, model_config) != (cfg.data_config, cfg.model_config):
        fprint(f"Using configs from flags.json: {data_config} / "
               f"{model_config}")

    loaders = fet.load(data_config, pretrained)
    model = fet.load(model_config, pretrained)

    example_batch = next(iter(loaders[0]))
    state = create_train_state(model, pretrained, example_batch,
                               jax.random.PRNGKey(pretrained.get("seed", 0)))
    model_path = osp.join(model_dir, model_file)
    fprint(f"Restoring model from {model_path}")
    state = ckpt_lib.restore_checkpoint(model_path, state)
    return model, state, pretrained, loaders
