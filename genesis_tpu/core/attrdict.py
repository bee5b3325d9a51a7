"""Attribute-access dictionaries used as config / loss / stat containers.

The reference uses the third-party `attrdict` package (reference train.py:19,
models/genesis_config.py:14). We provide a small first-party equivalent that
is also a valid JAX pytree (it is a plain dict subclass, so jax.tree_util
treats it as a dict), which lets AttrDicts of arrays flow through `jax.jit`.
"""

from typing import Any


class AttrDict(dict):
    """A dict whose items are also accessible as attributes.

    Unlike the legacy `attrdict` package, mutation through attributes writes
    through to the underlying dict (`d.x = 1` == `d['x'] = 1`).
    """

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def copy(self) -> "AttrDict":
        return AttrDict(self)


def _attrdict_flatten_with_keys(d):
    keys = sorted(d.keys())
    return (
        tuple((jax.tree_util.DictKey(k), d[k]) for k in keys),
        tuple(keys),
    )


def _attrdict_unflatten(keys, values):
    return AttrDict(zip(keys, values))


try:
    import jax

    jax.tree_util.register_pytree_with_keys(
        AttrDict, _attrdict_flatten_with_keys, _attrdict_unflatten)
except ImportError:  # pragma: no cover - jax is a hard dep in practice
    pass


class AttrDefault(AttrDict):
    """AttrDict with a default factory, like collections.defaultdict.

    Mirrors `attrdict.AttrDefault` used for eval stat accumulation
    (reference train.py:498).
    """

    def __init__(self, default_factory, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # Bypass __setattr__ (which writes into the dict).
        object.__setattr__(self, "_default_factory", default_factory)

    def __getitem__(self, key):
        if key not in self:
            self[key] = object.__getattribute__(self, "_default_factory")()
        return super().__getitem__(key)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]
