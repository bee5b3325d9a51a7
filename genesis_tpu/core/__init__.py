"""Core experiment infrastructure: flags, configs, run directories, logging.

This subsystem replaces the reference's `forge` dependency (the config/flag &
experiment system used at reference train.py:30-33,100,122-123,148,152) with
first-class equivalents, preserving the *config-file-as-module + load(cfg)*
contract and `flags.json` round-tripping.
"""

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.core import flags
from genesis_tpu.core.flagparse import config
from genesis_tpu.core import experiment
from genesis_tpu.core.experiment import fprint, json_load, load, init_checkpoint

__all__ = [
    "AttrDict", "flags", "config", "experiment",
    "fprint", "json_load", "load", "init_checkpoint",
]
