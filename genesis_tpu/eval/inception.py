"""InceptionV3 feature extractor for FID, in flax (NHWC).

Re-implementation of the FID-specific InceptionV3 used by the reference's
vendored pytorch_fid (third_party/pytorch_fid/inception.py): the
TF-ported "FID weights" variant, whose differences from stock InceptionV3
are (a) InceptionA/C/E mixed blocks whose pool branches use
count_include_pad=False average pooling, and (b) an InceptionE variant
using max pooling in the final block. Input protocol: 299x299, RGB scaled
to [-1, 1]; output: 2048-d pool3 features.

Weights: `load_params(path)` restores a flax params pytree saved as
msgpack/npz (ported offline from the public FID_WEIGHTS_URL checkpoint —
this container has no network egress, so the port is done out-of-band and
dropped at $GENESIS_TPU_FID_WEIGHTS). Without weights the FID pipeline
falls back to a deterministic random-feature extractor (see eval/fid.py),
which is self-consistent but NOT comparable to published FID numbers.
"""

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import serialization

WEIGHTS_ENV = "GENESIS_TPU_FID_WEIGHTS"


class BasicConv2d(nn.Module):
    out: int
    kernel: Sequence[int]
    stride: int = 1
    padding: any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out, tuple(self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avg_pool_nopad(x, window, stride=1, pad=1):
    """AvgPool2d(count_include_pad=False): averages only over valid
    elements near borders (the FID-Inception pooling fix)."""
    ones = jnp.ones_like(x[..., :1])
    sum_x = nn.pooling.pool(
        jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))),
        0.0, jax.lax.add, (window, window), (stride, stride), "VALID")
    cnt = nn.pooling.pool(
        jnp.pad(ones, ((0, 0), (pad, pad), (pad, pad), (0, 0))),
        0.0, jax.lax.add, (window, window), (stride, stride), "VALID")
    return sum_x / jnp.maximum(cnt, 1.0)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad(x, 3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad(x, 3)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID variant: last block uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_nopad(x, 3)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature trunk of FID-InceptionV3. Input: NHWC float
    in [0, 1], any spatial size (resized to 299 internally)."""

    @nn.compact
    def __call__(self, x):
        # Protocol: bilinear resize to 299 and scale to [-1, 1]
        # (pytorch_fid inception.py resize_input/normalize_input).
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear")
        x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def weights_path() -> Optional[str]:
    path = os.environ.get(WEIGHTS_ENV)
    if path and os.path.exists(path):
        return path
    default = os.path.expanduser(
        "~/.cache/genesis_tpu/fid_inception_params.msgpack")
    return default if os.path.exists(default) else None


def load_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
