"""Distributed flag registry.

Replaces the forge/absl flag pattern the reference relies on: every config
file declares its own flags at module level with `flags.DEFINE_*`, and the
union of all registered flags is parsed once by `core.config()` after the
data/model config modules have been imported (reference train.py:45-91;
models/genesis_config.py:33-52; datasets/multid_config.py:28-39).

Flags may be re-defined with an identical (type, default) signature, which
happens when two config files declare the same flag (e.g. `pixel_bound` in
both genesis and vae model configs). Conflicting re-definitions raise.
"""

import dataclasses
from typing import Any, Callable, Dict, Optional


@dataclasses.dataclass
class Flag:
    name: str
    default: Any
    help: str
    parser: Callable[[str], Any]
    type_name: str


_REGISTRY: Dict[str, Flag] = {}


def _parse_bool(value: str) -> bool:
    v = value.strip().lower()
    if v in ("true", "1", "yes", "t"):
        return True
    if v in ("false", "0", "no", "f"):
        return False
    raise ValueError(f"Cannot parse boolean flag value: {value!r}")


def _define(name: str, default: Any, help: str, parser, type_name: str):
    if name in _REGISTRY:
        existing = _REGISTRY[name]
        if existing.type_name != type_name:
            raise ValueError(
                f"Flag {name!r} re-defined with conflicting type "
                f"({existing.type_name} vs {type_name})")
        # Keep the first definition (and its default), like absl duplicate
        # module flags: later identical definitions are no-ops.
        return
    _REGISTRY[name] = Flag(name, default, help, parser, type_name)


def DEFINE_string(name: str, default: Optional[str], help: str = ""):
    _define(name, default, help, str, "string")


def DEFINE_integer(name: str, default: Optional[int], help: str = ""):
    _define(name, default, help, int, "integer")


def DEFINE_float(name: str, default: Optional[float], help: str = ""):
    _define(name, default, help, float, "float")


def DEFINE_boolean(name: str, default: Optional[bool], help: str = ""):
    _define(name, default, help, _parse_bool, "boolean")


# Alias matching absl spelling.
DEFINE_bool = DEFINE_boolean


def registry() -> Dict[str, Flag]:
    return _REGISTRY


def reset() -> None:
    """Clear all registered flags (used by tests)."""
    _REGISTRY.clear()


def defaults() -> Dict[str, Any]:
    return {name: f.default for name, f in _REGISTRY.items()}
