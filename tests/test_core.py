"""Tests for the core config/flag/experiment subsystem."""

import json
import os
import textwrap

import jax
import jax.numpy as jnp
import pytest

from genesis_tpu.core.attrdict import AttrDict, AttrDefault
from genesis_tpu.core import flags as flaglib
from genesis_tpu.core import flagparse as configlib
from genesis_tpu.core import experiment


def test_attrdict_basic():
    d = AttrDict(a=1)
    d.b = 2
    assert d["b"] == 2 and d.a == 1
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a
    assert d.get("missing", 7) == 7


def test_attrdict_is_pytree():
    d = AttrDict(x=jnp.ones(3), y=jnp.zeros(2))
    out = jax.jit(lambda t: AttrDict(x=t.x * 2, y=t.y + 1))(d)
    assert isinstance(out, AttrDict)
    assert float(out.x[0]) == 2.0 and float(out.y[0]) == 1.0
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2


def test_attrdefault():
    d = AttrDefault(list)
    d["k"].append(1)
    d.k.append(2)
    assert d["k"] == [1, 2]


def test_flag_registry_and_parse(monkeypatch):
    monkeypatch.setattr(flaglib, "_REGISTRY", {})
    flaglib.DEFINE_string("name", "default", "")
    flaglib.DEFINE_integer("num", 3, "")
    flaglib.DEFINE_float("rate", 0.5, "")
    flaglib.DEFINE_boolean("flagged", False, "")
    flaglib.DEFINE_boolean("other", True, "")
    # Identical re-definition is a no-op
    flaglib.DEFINE_integer("num", 3, "")
    cfg = configlib.parse(
        ["--name", "x", "--num=7", "--flagged", "--noother",
         "--rate", "0.25"],
        import_configs=False)
    assert cfg.name == "x"
    assert cfg.num == 7 and isinstance(cfg.num, int)
    assert cfg.rate == 0.25
    assert cfg.flagged is True
    assert cfg.other is False


def test_flag_conflicting_redefinition(monkeypatch):
    monkeypatch.setattr(flaglib, "_REGISTRY", {})
    flaglib.DEFINE_string("dup", "a", "")
    with pytest.raises(ValueError):
        flaglib.DEFINE_integer("dup", 1, "")


def test_config_file_load_contract(tmp_path, monkeypatch):
    """Config-file-as-module + load(cfg) contract round-trips."""
    monkeypatch.setattr(flaglib, "_REGISTRY", {})
    cfg_file = tmp_path / "toy_config.py"
    cfg_file.write_text(textwrap.dedent("""
        from genesis_tpu.core import flags
        flags.DEFINE_integer('toy_value', 42, '')
        def load(cfg):
            return cfg.toy_value * 2
    """))
    result = experiment.load(str(cfg_file), AttrDict(toy_value=21))
    assert result == 42


def test_init_checkpoint_run_dirs(tmp_path, monkeypatch):
    monkeypatch.setattr(flaglib, "_REGISTRY", {})
    flaglib.DEFINE_integer("some_flag", 5, "")
    logdir = str(tmp_path / "results" / "run")
    run1, ck1 = experiment.init_checkpoint(logdir, "d.py", "m.py", False)
    assert run1.endswith(os.sep + "1") and ck1 is None
    assert os.path.exists(os.path.join(run1, "flags.json"))
    run2, _ = experiment.init_checkpoint(logdir, "d.py", "m.py", False)
    assert run2.endswith(os.sep + "2")
    # Resume goes back to the latest numbered dir
    open(os.path.join(run2, "model.ckpt-100"), "w").close()
    run3, ck3 = experiment.init_checkpoint(logdir, "d.py", "m.py", True)
    assert run3 == run2
    assert ck3.endswith("model.ckpt-100")
    # flags.json round-trip
    with open(os.path.join(run1, "flags.json")) as f:
        payload = json.load(f)
    assert payload["some_flag"] == 5
    assert payload["data_config"] == "d.py"
