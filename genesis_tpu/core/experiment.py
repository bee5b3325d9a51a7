"""Experiment tools: config-module loading, run directories, tee logging.

Replaces `forge.experiment_tools` (reconstructed from reference call sites:
train.py:122-123 `init_checkpoint`, train.py:148,152 `load`,
scripts/compute_fid.py:55-57,77-83 `EXPERIMENT_FOLDER`/`FPRINT_FILE`/
`json_load`).

Semantics preserved:
  * a "config" is a Python file with module-level flag definitions and a
    `load(cfg)` function; `load(path, cfg)` imports it and calls that.
  * `init_checkpoint(logdir, data_cfg, model_cfg, resume)` creates numbered
    run dirs `<logdir>/<n>`, persists `flags.json`, and on resume returns the
    latest checkpoint found in the latest run dir.
  * `fprint(msg)` tees to stdout and a log file inside the run dir.
"""

import datetime
import importlib
import importlib.util
import json
import os
import os.path as osp
import sys
from typing import Any, Optional, Tuple

# Module globals mirroring forge's (scripts/compute_fid.py:56-57 usage).
EXPERIMENT_FOLDER: Optional[str] = None
FPRINT_FILE: str = "fprint.txt"

_module_cache = {}


def fprint(msg: Any, flush: bool = False) -> None:
    """Print to stdout and append to the experiment log file."""
    text = str(msg)
    print(text, flush=flush)
    if EXPERIMENT_FOLDER is not None:
        try:
            with open(osp.join(EXPERIMENT_FOLDER, FPRINT_FILE), "a") as f:
                f.write(text + "\n")
        except OSError:
            pass


def json_load(path: str):
    with open(path, "r") as f:
        return json.load(f)


def json_save(path: str, obj) -> None:
    def _default(o):
        # Make numpy / jax scalars serialisable.
        if hasattr(o, "item"):
            return o.item()
        return str(o)
    with open(path, "w") as f:
        json.dump(obj, f, indent=4, sort_keys=True, default=_default)


def import_config_module(path: str):
    """Import a config file (by filesystem path or dotted module name)."""
    if path in _module_cache:
        return _module_cache[path]
    if path.endswith(".py") or os.sep in path:
        file_path = path
        if not osp.isabs(file_path):
            # Resolve relative to CWD first, then to the repo root.
            if not osp.exists(file_path):
                repo_root = osp.dirname(osp.dirname(osp.dirname(
                    osp.abspath(__file__))))
                candidate = osp.join(repo_root, file_path)
                if osp.exists(candidate):
                    file_path = candidate
        if not osp.exists(file_path):
            raise FileNotFoundError(f"Config file not found: {path}")
        mod_name = "genesis_tpu_cfg_" + (
            osp.splitext(osp.basename(file_path))[0])
        spec = importlib.util.spec_from_file_location(mod_name, file_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = module
        spec.loader.exec_module(module)
    else:
        module = importlib.import_module(path)
    _module_cache[path] = module
    return module


def reset_module_cache() -> None:
    """Clear the config-module cache. Pair with flags.reset() in tests:
    a cached config module will not re-run its module-level DEFINE_*
    calls, so flags registered at first import would stay lost."""
    _module_cache.clear()


def load(path: str, cfg, **kwargs):
    """Import a config file and call its `load(cfg)` factory."""
    module = import_config_module(path)
    if not hasattr(module, "load"):
        raise AttributeError(f"Config module {path} has no load(cfg)")
    return module.load(cfg, **kwargs)


def _numbered_subdirs(logdir: str):
    if not osp.isdir(logdir):
        return []
    out = []
    for name in os.listdir(logdir):
        if name.isdigit() and osp.isdir(osp.join(logdir, name)):
            out.append(int(name))
    return sorted(out)


def find_latest_checkpoint(run_dir: str) -> Optional[str]:
    """Latest checkpoint in a run dir: `model.ckpt-latest` if present, else
    the highest-numbered `model.ckpt-<n>` / `model.ckpt-FINAL`."""
    latest = osp.join(run_dir, "model.ckpt-latest")
    if osp.exists(latest):
        return latest
    best, best_iter = None, -1
    if not osp.isdir(run_dir):
        return None
    for name in os.listdir(run_dir):
        if not name.startswith("model.ckpt-"):
            continue
        suffix = name[len("model.ckpt-"):]
        if suffix == "FINAL":
            return osp.join(run_dir, name)
        if suffix.isdigit() and int(suffix) > best_iter:
            best_iter = int(suffix)
            best = osp.join(run_dir, name)
    return best


def init_checkpoint(logdir: str, data_config: str, model_config: str,
                    resume: bool = False,
                    cfg=None) -> Tuple[str, Optional[str]]:
    """Create (or resume) a numbered run directory under `logdir`.

    Returns (run_dir, resume_checkpoint). Mirrors forge's behaviour as used
    at reference train.py:116-124: fresh runs get `<logdir>/<n+1>` with
    flags.json saved; resume reuses the latest numbered dir and returns its
    latest checkpoint path (or None if the dir has none).
    """
    global EXPERIMENT_FOLDER
    os.makedirs(logdir, exist_ok=True)
    existing = _numbered_subdirs(logdir)
    resume_checkpoint = None
    if resume and existing:
        run_dir = osp.join(logdir, str(existing[-1]))
        resume_checkpoint = find_latest_checkpoint(run_dir)
    else:
        nxt = (existing[-1] + 1) if existing else 1
        run_dir = osp.join(logdir, str(nxt))
        os.makedirs(run_dir, exist_ok=True)
    # Persist flags for round-tripping (scripts restore hyperparameters from
    # the run's flags.json — reference scripts/compute_fid.py:80-83).
    from genesis_tpu.core import flags as _flags
    flags_path = osp.join(run_dir, "flags.json")
    if not (resume and osp.exists(flags_path)):
        payload = dict(_flags.defaults())
        if cfg is not None:
            payload.update(dict(cfg))
        payload["data_config"] = data_config
        payload["model_config"] = model_config
        json_save(flags_path, payload)
    EXPERIMENT_FOLDER = run_dir
    return run_dir, resume_checkpoint


def timestamp() -> str:
    return datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
