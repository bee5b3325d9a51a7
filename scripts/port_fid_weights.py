#!/usr/bin/env python
"""Port the FID-Inception torch checkpoint to flax msgpack.

The reference computes FID with the TF-ported "FID weights" InceptionV3
(third_party/pytorch_fid/inception.py:13 FID_WEIGHTS_URL, loaded around
inception.py:160). This container has no network egress, so the .pth file
must be dropped out-of-band; this tool converts it onto the parameter
tree of our flax port (genesis_tpu/eval/inception.py) so
`make_extractor("inception")` produces numbers comparable to the
published tables.

Usage:
  python scripts/port_fid_weights.py --torch_ckpt pt_inception-2015-12-05.pth \
      [--out ~/.cache/genesis_tpu/fid_inception_params.msgpack] [--verify]

`--verify` builds a torch oracle of the same architecture, loads the SAME
state dict into both graphs, and asserts pool3 features agree — proving
the mapping independent of which weights file is used (the test suite
runs this with random weights; tests/test_fid_port.py).

Checkpoint layout (torchvision Inception3 names, FID variant):
  Conv2d_1a_3x3.conv.weight, Conv2d_1a_3x3.bn.{weight,bias,running_*},
  ..., Mixed_5b.branch1x1.conv.weight, ..., fc.{weight,bias} (unused),
  AuxLogits.* (unused).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Torch keys that have no counterpart in the pool3 feature trunk.
_SKIP_PREFIXES = ("fc.", "AuxLogits.")


# ---------------------------------------------------------------------------
# state-dict -> flax variables
# ---------------------------------------------------------------------------

def flax_template():
    """Shape-only variables template for InceptionV3FID (no compute)."""
    import jax
    import jax.numpy as jnp
    from genesis_tpu.eval.inception import InceptionV3FID

    model = InceptionV3FID()
    return jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 299, 299, 3), jnp.float32))


def port_state_dict(sd, template=None):
    """Map a torch FID-Inception state dict onto the flax variables tree.

    Strict: raises on any unexpected key, and (when a template is given)
    on any flax leaf left unfilled or shape-mismatched.
    """
    params, batch_stats = {}, {}
    for key, tensor in sd.items():
        if key.startswith(_SKIP_PREFIXES) or key.endswith(
                "num_batches_tracked"):
            continue
        parts = key.split(".")
        *mods, leaf = parts
        sub = mods[-1]
        arr = np.asarray(tensor, dtype=np.float32)
        if sub == "conv" and leaf == "weight":
            dest, name = params, "kernel"
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif sub == "bn" and leaf == "weight":
            dest, name = params, "scale"
        elif sub == "bn" and leaf == "bias":
            dest, name = params, "bias"
        elif sub == "bn" and leaf == "running_mean":
            dest, name = batch_stats, "mean"
        elif sub == "bn" and leaf == "running_var":
            dest, name = batch_stats, "var"
        else:
            raise ValueError(f"unexpected checkpoint key: {key}")
        node = dest
        for m in mods:
            node = node.setdefault(m, {})
        node[name] = arr
    variables = {"params": params, "batch_stats": batch_stats}

    if template is not None:
        import jax
        flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
        flat_v = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
        missing = set(map(str, flat_t)) - set(map(str, flat_v))
        extra = set(map(str, flat_v)) - set(map(str, flat_t))
        if missing or extra:
            raise ValueError(
                f"tree mismatch: missing={sorted(missing)[:5]} "
                f"extra={sorted(extra)[:5]}")
        for path, leaf in flat_t.items():
            got = flat_v[path].shape
            if tuple(leaf.shape) != tuple(got):
                raise ValueError(f"{path}: expected {leaf.shape}, got {got}")
    return variables


# ---------------------------------------------------------------------------
# Torch oracle (same architecture, torchvision-style names) — used by
# --verify and by tests/test_fid_port.py to prove the mapping without the
# real weights file. Lives here so the layout definition has one home.
# ---------------------------------------------------------------------------

def build_torch_fid_inception():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class BasicConv2d(tnn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgpool_fid(x):  # count_include_pad=False: the FID pooling fix
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class InceptionA(tnn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features,
                                           kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avgpool_fid(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              stride=2)

        def forward(self, x):
            import torch
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class InceptionC(tnn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(avgpool_fid(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3,
                                           stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                             padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                             padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3,
                                             stride=2)

        def forward(self, x):
            import torch
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class InceptionE(tnn.Module):
        def __init__(self, cin, use_max_pool=False):
            super().__init__()
            self.use_max_pool = use_max_pool
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                               padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                               padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            if self.use_max_pool:
                bp = F.max_pool2d(x, 3, stride=1, padding=1)
            else:
                bp = avgpool_fid(x)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class FIDInception(tnn.Module):
        """Pool3 trunk; input NCHW in [0,1], resized to 299 + scaled."""

        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3,
                                             padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048, use_max_pool=True)

        def forward(self, x):
            if x.shape[-2:] != (299, 299):
                x = F.interpolate(x, size=(299, 299), mode="bilinear",
                                  align_corners=False)
            x = 2.0 * x - 1.0
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                        self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                        self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                        self.Mixed_7b, self.Mixed_7c):
                x = blk(x)
            return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)

    return FIDInception()


def verify_parity(sd, variables, batch=2, size=299, atol=1e-4, seed=0):
    """Load `sd` into the torch oracle and `variables` into the flax
    graph; assert pool3 features agree on random input."""
    import torch
    import jax.numpy as jnp
    from genesis_tpu.eval.inception import InceptionV3FID

    oracle = build_torch_fid_inception()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
         if not (k.startswith(_SKIP_PREFIXES)
                 or k.endswith("num_batches_tracked"))},
        strict=False)
    assert not missing, f"oracle missing keys: {missing[:5]}"
    assert not unexpected, f"oracle unexpected keys: {unexpected[:5]}"
    oracle.eval()

    rs = np.random.RandomState(seed)
    x = rs.rand(batch, size, size, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(InceptionV3FID().apply(variables, jnp.asarray(x)))
    err = np.max(np.abs(got - ref))
    assert err <= atol, f"pool3 mismatch: max|diff|={err}"
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True,
                    help=".pth file (pt_inception-2015-12-05 layout)")
    ap.add_argument("--out", default=os.path.expanduser(
        "~/.cache/genesis_tpu/fid_inception_params.msgpack"))
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax(platform="cpu")
    import torch
    from flax import serialization

    sd = torch.load(args.torch_ckpt, map_location="cpu",
                    weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    elif "state_dict" in sd and not any("." in k for k in sd):
        sd = sd["state_dict"]
    variables = port_state_dict(sd, flax_template())
    if args.verify:
        err = verify_parity(sd, variables)
        print(f"parity verified: max|pool3 diff| = {err:.2e}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB). Set "
          f"GENESIS_TPU_FID_WEIGHTS={args.out} (or leave at the default "
          "cache path) to enable the Inception FID extractor.")


if __name__ == "__main__":
    main()
