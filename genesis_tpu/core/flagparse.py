"""Command-line config parsing.

`config()` mirrors `forge.config()` (reference train.py:100): it pre-parses
`--data_config` / `--model_config`, imports both config files so their
module-level flag definitions register, then parses the full command line
against the union of all registered flags and returns an AttrDict.

Supported syntaxes: `--flag value`, `--flag=value`, and for booleans also
bare `--flag` / `--noflag`.
"""

import sys
from typing import Any, Dict, List, Optional, Sequence

from genesis_tpu.core import flags as _flags
from genesis_tpu.core.attrdict import AttrDict


def _extract_flag(argv: List[str], name: str) -> Optional[str]:
    """Find the value of --name in argv without consuming it."""
    key = f"--{name}"
    for i, arg in enumerate(argv):
        if arg == key and i + 1 < len(argv):
            return argv[i + 1]
        if arg.startswith(key + "="):
            return arg.split("=", 1)[1]
    return None


def _parse_argv(argv: Sequence[str]) -> Dict[str, str]:
    """Parse --k v / --k=v / --bool / --nobool pairs into a raw string dict."""
    raw: Dict[str, Any] = {}
    i = 0
    argv = list(argv)
    registry = _flags.registry()
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"Unexpected positional argument: {arg!r}")
        body = arg[2:]
        if "=" in body:
            name, value = body.split("=", 1)
            raw[name] = value
            i += 1
            continue
        name = body
        # Bare boolean forms.
        if name in registry and registry[name].type_name == "boolean":
            nxt = argv[i + 1] if i + 1 < len(argv) else None
            if nxt is not None and not nxt.startswith("--"):
                raw[name] = nxt
                i += 2
            else:
                raw[name] = "true"
                i += 1
            continue
        if name.startswith("no") and name[2:] in registry and \
                registry[name[2:]].type_name == "boolean":
            raw[name[2:]] = "false"
            i += 1
            continue
        if i + 1 >= len(argv):
            raise ValueError(f"Flag --{name} is missing a value")
        raw[name] = argv[i + 1]
        i += 2
    return raw


def parse(argv: Optional[Sequence[str]] = None,
          import_configs: bool = True) -> AttrDict:
    """Parse flags into a config AttrDict.

    Args:
      argv: command line (without program name); defaults to sys.argv[1:].
      import_configs: import the --data_config/--model_config files first so
        that their flags register (the forge pattern).
    """
    from genesis_tpu.core import experiment  # local import to avoid cycle

    if argv is None:
        argv = sys.argv[1:]
    argv = list(argv)

    if import_configs:
        for key in ("data_config", "model_config"):
            path = _extract_flag(argv, key)
            if path is None:
                path = _flags.registry().get(key)
                path = path.default if path is not None else None
            if path:
                experiment.import_config_module(path)

    raw = _parse_argv(argv)
    cfg = AttrDict(_flags.defaults())
    registry = _flags.registry()
    for name, value in raw.items():
        if name in registry:
            cfg[name] = registry[name].parser(value)
        else:
            # Unknown flags are kept as strings, with a warning. This keeps
            # old run flags.json files loadable across versions.
            print(f"WARNING: unknown flag --{name}; keeping raw string")
            cfg[name] = value
    # Record which flags the user explicitly set as an *instance attribute*
    # (not a dict item, so it never leaks into flags.json). Consumers such
    # as eval.restore use this to decide whether a CLI value should
    # override the pretrained run's flags.json.
    object.__setattr__(cfg, "_user_set", frozenset(raw))
    return cfg


def user_set(cfg) -> frozenset:
    """The set of flag names explicitly given on the command line that
    produced `cfg` (empty for programmatically-built configs)."""
    return getattr(cfg, "_user_set", frozenset())


def config(argv: Optional[Sequence[str]] = None) -> AttrDict:
    """forge.config() equivalent."""
    return parse(argv)


def print_flags(cfg: Optional[AttrDict] = None) -> None:
    """Pretty-print the active flag values (forge print_flags)."""
    import json as _json
    from genesis_tpu.core.experiment import fprint
    values = dict(cfg) if cfg is not None else _flags.defaults()
    fprint(_json.dumps(values, indent=4, sort_keys=True, default=str))
