"""Import shims for running the torch reference at /root/reference.

The reference depends on packages absent from this container: `forge`
(an empty submodule directory in the reference checkout), `attrdict`,
`torchvision`, and `tensorflow` (imported at module scope by
utils/misc.py). `install()` registers minimal stand-ins for exactly the
surface the reference's model/data/train modules touch, and puts the
reference root on sys.path, so the reference code can be imported and
executed UNMODIFIED — used by the golden-parity tests
(tests/test_ref_parity.py) and the measured-baseline runner
(scripts/run_reference_baseline.py).

The reference tree is treated as read-only; runs write only to the
results_dir passed on the command line.
"""

import importlib.util
import json
import os
import os.path as osp
import sys
import types

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# forge.flags — distributed flag registry (mirrors the absl-backed original
# the same way genesis_tpu.core.flags does for our own CLIs).
# ---------------------------------------------------------------------------

def _make_forge(reference_root):
    forge = types.ModuleType("forge")
    flags_mod = types.ModuleType("forge.flags")
    fet_mod = types.ModuleType("forge.experiment_tools")

    registry = {}

    def _parse_bool(v):
        s = str(v).strip().lower()
        if s in ("true", "1", "yes", "t"):
            return True
        if s in ("false", "0", "no", "f"):
            return False
        raise ValueError(f"Cannot parse boolean flag value: {v!r}")

    def _define(name, default, parser):
        # absl tolerates identical duplicate definitions across modules.
        registry.setdefault(name, (default, parser))

    flags_mod.DEFINE_string = lambda n, d, h="": _define(n, d, str)
    flags_mod.DEFINE_integer = lambda n, d, h="": _define(n, d, int)
    flags_mod.DEFINE_float = lambda n, d, h="": _define(n, d, float)
    flags_mod.DEFINE_boolean = lambda n, d, h="": _define(n, d, _parse_bool)
    flags_mod.DEFINE_bool = flags_mod.DEFINE_boolean

    class _FLAGS:
        """Just enough of absl FlagValues: train.py json-dumps
        fet._flags.FLAGS.__flags (reference train.py:142)."""

    # Set outside the class body: inside it the name would be mangled to
    # _FLAGS__flags, but external readers access the literal "__flags".
    setattr(_FLAGS, "__flags", {})
    flags_mod.FLAGS = _FLAGS
    flags_mod._registry = registry

    def _import_config(path):
        full = path if osp.isabs(path) else osp.join(reference_root, path)
        name = "refcfg_" + osp.splitext(osp.basename(full))[0]
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, full)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    def _argv_value(argv, name):
        key = "--" + name
        for i, a in enumerate(argv):
            if a == key and i + 1 < len(argv):
                return argv[i + 1]
            if a.startswith(key + "="):
                return a.split("=", 1)[1]
        return None

    def config():
        from genesis_tpu.core.attrdict import AttrDict
        argv = sys.argv[1:]
        # Two-phase parse like real forge: import the config modules so
        # their module-level DEFINE_* calls register, then parse argv
        # against the union of all registered flags.
        for key in ("data_config", "model_config"):
            path = _argv_value(argv, key)
            if path is None and key in registry:
                path = registry[key][0]
            if path:
                _import_config(path)
        cfg = AttrDict({n: d for n, (d, _) in registry.items()})
        i = 0
        while i < len(argv):
            arg = argv[i]
            if not arg.startswith("--"):
                raise ValueError(f"Unexpected positional argument: {arg!r}")
            body = arg[2:]
            if "=" in body:
                name, value = body.split("=", 1)
                i += 1
            elif body in registry and registry[body][1] is _parse_bool and (
                    i + 1 >= len(argv) or argv[i + 1].startswith("--")):
                name, value = body, "true"
                i += 1
            else:
                name, value = body, argv[i + 1]
                i += 2
            if name in registry:
                cfg[name] = registry[name][1](value)
            else:
                cfg[name] = value
        setattr(_FLAGS, "__flags", dict(cfg))
        return cfg

    forge.config = config
    forge.flags = flags_mod

    # ---- forge.experiment_tools --------------------------------------
    def fprint(s, flush=False):
        print(s, flush=True)

    def load(cfg_path, cfg, **kwargs):
        return _import_config(cfg_path).load(cfg, **kwargs)

    def init_checkpoint(logdir, data_config, model_config, resume):
        """Numbered run dirs like real forge: <logdir>/<n>; returns
        (run_dir, resume_checkpoint_path_or_None)."""
        os.makedirs(logdir, exist_ok=True)
        existing = sorted(int(d) for d in os.listdir(logdir)
                          if d.isdigit())
        if resume and existing:
            run = osp.join(logdir, str(existing[-1]))
            ckpt = osp.join(run, "model.ckpt-latest")
            return run, (ckpt if osp.exists(ckpt) else None)
        run = osp.join(logdir, str(existing[-1] + 1 if existing else 1))
        os.makedirs(run, exist_ok=True)
        with open(osp.join(run, "flags.json"), "w") as f:
            json.dump(getattr(flags_mod.FLAGS, "__flags", {}), f,
                      indent=2, default=str)
        return run, None

    def print_flags():
        fprint(json.dumps(getattr(flags_mod.FLAGS, "__flags", {}),
                          indent=4, sort_keys=True, default=str))

    def json_load(path):
        with open(path) as f:
            return json.load(f)

    fet_mod.fprint = fprint
    fet_mod.load = load
    fet_mod.init_checkpoint = init_checkpoint
    fet_mod.print_flags = print_flags
    fet_mod.json_load = json_load
    # Module-level attrs reference eval CLIs assign for fprint routing.
    fet_mod.EXPERIMENT_FOLDER = None
    fet_mod.FPRINT_FILE = None
    fet_mod._flags = flags_mod
    forge.experiment_tools = fet_mod
    return forge, flags_mod, fet_mod


# ---------------------------------------------------------------------------
# attrdict / torchvision / tensorflow stand-ins
# ---------------------------------------------------------------------------

def _make_attrdict():
    from genesis_tpu.core.attrdict import AttrDefault, AttrDict
    mod = types.ModuleType("attrdict")
    mod.AttrDict = AttrDict
    mod.AttrDefault = AttrDefault
    return mod


def _make_torchvision():
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    utils = types.ModuleType("torchvision.utils")
    models = types.ModuleType("torchvision.models")
    inception = types.ModuleType("torchvision.models.inception")

    class ToTensor:
        """PIL image / HWC uint8 ndarray -> CHW float tensor in [0,1]
        (the only transform the reference data configs use)."""

        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(
                np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t

    transforms.ToTensor = ToTensor

    def make_grid(tensor, nrow=8, padding=2, **kwargs):
        # Image-logging helper; a plain concatenation is enough for the
        # baseline runs (TB image quality is irrelevant there).
        t = torch.as_tensor(tensor)
        return t.reshape(-1, *t.shape[-2:])[:3]

    utils.make_grid = make_grid

    class _Blk(torch.nn.Module):
        # Base for FIDInception* subclasses in third_party/pytorch_fid;
        # never instantiated unless real FID weights are requested.
        def __init__(self, *a, **kw):
            super().__init__()

    for cls in ("InceptionA", "InceptionB", "InceptionC", "InceptionD",
                "InceptionE"):
        setattr(inception, cls, _Blk)
    tv.transforms = transforms
    tv.utils = utils
    tv.models = models
    models.inception = inception
    return tv, transforms, utils, models, inception


def _make_tensorflow():
    tf = types.ModuleType("tensorflow")
    errors = types.ModuleType("tensorflow.errors")

    class OutOfRangeError(Exception):
        pass

    errors.OutOfRangeError = OutOfRangeError
    tf.errors = errors
    return tf, errors


def _register(name, mod):
    # A real ModuleSpec: torch._dynamo probes importlib.util.find_spec
    # on sys.modules entries and chokes on __spec__ = None.
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod


def install(reference_root: str = REFERENCE_ROOT) -> None:
    """Register all shims in sys.modules and put the reference on
    sys.path (after entries already present, so the repo's own packages
    keep precedence). Idempotent."""
    if "forge" not in sys.modules or not hasattr(
            sys.modules["forge"], "config"):
        forge, flags_mod, fet_mod = _make_forge(reference_root)
        _register("forge", forge)
        _register("forge.flags", flags_mod)
        _register("forge.experiment_tools", fet_mod)
    if "attrdict" not in sys.modules:
        _register("attrdict", _make_attrdict())
    if "torchvision" not in sys.modules:
        tv, transforms, utils, models, inception = _make_torchvision()
        _register("torchvision", tv)
        _register("torchvision.transforms", transforms)
        _register("torchvision.utils", utils)
        _register("torchvision.models", models)
        _register("torchvision.models.inception", inception)
    if "tensorflow" not in sys.modules:
        tf, errors = _make_tensorflow()
        _register("tensorflow", tf)
        _register("tensorflow.errors", errors)
    if reference_root not in sys.path:
        sys.path.append(reference_root)
