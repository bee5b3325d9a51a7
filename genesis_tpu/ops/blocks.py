"""Elementary NN blocks and parameterisation helpers.

Functional parity with reference modules/blocks.py:18-178 and the math used
throughout the reference models, re-expressed for NHWC tensors and JAX:

  * `clamp_preserve_gradients`  (blocks.py:18-20)  -> straight-through clamp
  * `to_sigma` / `to_var`       (blocks.py:22-26)
  * `to_prior_sigma`            (blocks.py:28-34)
  * `pixel_coords`              (blocks.py:42-47)  -> NHWC coord grid
  * euclidian/squared distance  (blocks.py:49-71)
  * `ScalarGate`                (blocks.py:85-90)
  * `BroadcastLayer`/`PixelCoords` (blocks.py:104-130)
  * Conv(+IN/GN)+ReLU wrappers  (blocks.py:144-165)
  * `SemiConv`                  (blocks.py:167-178)

Weight init follows the torch fan-in uniform scheme the reference trains
with (uniform with variance 1/(3*fan_in)); biases are zero-initialised.
"""

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------

# torch nn.Conv2d/nn.Linear default: kaiming_uniform(a=sqrt(5)) == uniform
# with bound sqrt(1/fan_in), i.e. variance 1/(3*fan_in).
torch_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
zeros_init = nn.initializers.zeros


def upcast_f32(x):
    """bf16 -> f32 upcast at stage boundaries (losses/masks stay f32),
    but float64 passes through untouched so the f64 golden-parity tests
    (tests/test_ref_parity_grad_sample.py) see true f64 math instead of
    frozen f32 rounding noise."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def Conv(features: int, kernel: int, stride: int = 1,
         padding="SAME", use_bias: bool = True, name: Optional[str] = None,
         dtype=None):
    """2D conv wrapper with torch-style init. padding: 'SAME'|'VALID'|int.
    `dtype` is the computation dtype (params stay float32)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, use_bias=use_bias, dtype=dtype,
                   kernel_init=torch_init, bias_init=zeros_init, name=name)


def ConvT(features: int, kernel: int, stride: int = 1,
          padding="SAME", use_bias: bool = True, name: Optional[str] = None,
          dtype=None, output_padding: Optional[int] = None):
    """2D transposed conv. An int `padding` is interpreted in torch
    ConvTranspose2d terms (p, with output_padding defaulting to
    stride-1) and lowered to the exact asymmetric lax padding
    ((k-1-p, k-1-p+op), ...) — torch ALIGNMENT parity: a flax 'SAME'
    deconv has the same shape but is shifted one pixel up-left relative
    to torch k5/s2/p2/op1 (verified numerically in
    tests/test_ref_parity.py; kernels additionally differ by a spatial
    flip, handled by scripts/port_ref_weights.py).

    Perf note (measured, TPU v5e): a sub-pixel phase decomposition of the
    stride-2 deconvs (s^2 stride-1 correlations of the undilated input,
    interleaved) was implemented and benchmarked — it LOST to the stock
    lhs-dilated lowering on the full GENESIS-V2 train step: 12.55 vs
    11.49 ms at 64px/K9 and 54.8 vs 46.2 ms at 128px/K11. XLA:TPU's conv
    unit handles base dilation natively (its FLOP count already excludes
    the dilation zeros), while the decomposition pays 4 extra
    full-tensor relayouts for the phase interleave. Stock flax wins."""
    if isinstance(padding, int):
        p = padding
        op = (stride - 1) if output_padding is None else output_padding
        lo, hi = kernel - 1 - p, kernel - 1 - p + op
        padding = ((lo, hi), (lo, hi))
    return nn.ConvTranspose(features, (kernel, kernel),
                            strides=(stride, stride), padding=padding,
                            use_bias=use_bias, dtype=dtype,
                            kernel_init=torch_init,
                            bias_init=zeros_init, name=name)


def Dense(features: int, name: Optional[str] = None, dtype=None):
    return nn.Dense(features, kernel_init=torch_init, bias_init=zeros_init,
                    dtype=dtype, name=name)


# ---------------------------------------------------------------------------
# Parameterisations (pure functions)
# ---------------------------------------------------------------------------

def clamp_preserve_gradients(x, lower, upper):
    """Clamp forward, identity backward (reference blocks.py:18-20)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lower, upper) - x)


def to_sigma(x):
    return jax.nn.softplus(x + 0.5) + 1e-8


def to_var(x):
    return to_sigma(x) ** 2


def to_prior_sigma(x, sigmoid_bias: float = 4.0, eps: float = 1e-4):
    """Bounds a learned prior sigma to [eps, 1+eps], initialised near 1."""
    return jax.nn.sigmoid(x + sigmoid_bias) + eps


def pixel_coords(img_size: int, dtype=jnp.float32):
    """[1, H, W, 2] coord grid; channel 0 varies along H, 1 along W
    (matches torch.meshgrid 'ij' in reference blocks.py:42-47)."""
    g = jnp.linspace(-1.0, 1.0, img_size, dtype=dtype)
    g1 = jnp.broadcast_to(g[:, None], (img_size, img_size))
    g2 = jnp.broadcast_to(g[None, :], (img_size, img_size))
    return jnp.stack([g1, g2], axis=-1)[None]  # [1, H, W, 2]


def euclidian_norm(x, axis=-1):
    sq = jnp.sum(x ** 2, axis=axis)
    return jnp.sqrt(clamp_preserve_gradients(sq, 1e-10, 1e10))


def squared_distance(embed_a, embed_b, axis=-1):
    """Sum of squared differences along the channel axis (broadcasts)."""
    return jnp.sum((embed_a - embed_b) ** 2, axis=axis)


def euclidian_distance(embed_a, embed_b, axis=-1):
    return euclidian_norm(embed_a - embed_b, axis=axis)


# ---------------------------------------------------------------------------
# Resizing (exact torch-nearest semantics, cheap on TPU)
# ---------------------------------------------------------------------------

def down2_nearest(x):
    """Exact torch F.interpolate(scale_factor=0.5, mode='nearest'): take
    every other pixel. x: [..., H, W, C]."""
    return x[..., ::2, ::2, :]


def up2_nearest(x):
    """Exact torch F.interpolate(scale_factor=2, mode='nearest')."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def resize_nearest(x, size: Tuple[int, int]):
    shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


def resize_bilinear(x, size: Tuple[int, int]):
    shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def make_norm(kind: Optional[str], groups: int = 8):
    """Factory for the reference's norm options ({'bn','in','gn',None})."""
    if kind in (None, "none"):
        return None
    if kind == "in":
        # InstanceNorm2d(affine=True) == GroupNorm with one channel/group.
        return lambda name=None: nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=1e-5, name=name)
    if kind == "gn":
        return lambda name=None: nn.GroupNorm(
            num_groups=groups, epsilon=1e-5, name=name)
    if kind == "bn":
        return lambda name=None: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, name=name)
    raise ValueError(f"Normalisation option not recognised: {kind}")


def apply_norm(norm_layer, x, train: bool):
    if isinstance(norm_layer, nn.BatchNorm):
        return norm_layer(x, use_running_average=not train)
    return norm_layer(x)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class ScalarGate(nn.Module):
    """y = g * x with learned scalar g (reference blocks.py:85-90)."""
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        gate = self.param("gate", lambda key: jnp.asarray(self.init,
                                                          jnp.float32))
        return gate * x


class PixelCoords(nn.Module):
    """Append 2 coordinate channels (reference blocks.py:119-130)."""
    im_dim: int

    @nn.compact
    def __call__(self, x):
        coords = pixel_coords(self.im_dim, dtype=x.dtype)
        coords = jnp.broadcast_to(
            coords, x.shape[:-3] + coords.shape[1:])
        return jnp.concatenate([x, coords], axis=-1)


class BroadcastLayer(nn.Module):
    """Spatial broadcast: tile a vector (or resize a map) over a dim x dim
    grid and append pixel coords (reference blocks.py:104-117)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:  # [B, D] -> [B, dim, dim, D]
            x = x[:, None, None, :]
            x = jnp.broadcast_to(
                x, (x.shape[0], self.dim, self.dim, x.shape[-1]))
        else:
            x = resize_nearest(x, (self.dim, self.dim))
        return PixelCoords(self.dim)(x)


class ConvReLU(nn.Module):
    nout: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    dtype: Any = None
    use_pallas: bool = False  # accepted for UNet block interchange; no-op

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.relu(Conv(self.nout, self.kernel, self.stride,
                            self.padding, dtype=self.dtype)(x))


class ConvINReLU(nn.Module):
    nout: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.nout, self.kernel, self.stride, self.padding,
                 use_bias=False, dtype=self.dtype)(x)
        # GNReLU named to preserve the nn.GroupNorm param path
        # (instance norm == one channel per group, i.e. groups=nout).
        return GNReLU(channels=self.nout, groups=self.nout,
                      epsilon=1e-5, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="GroupNorm_0")(x)


class ConvGNReLU(nn.Module):
    nout: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    groups: int = 8
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.nout, self.kernel, self.stride, self.padding,
                 use_bias=False, dtype=self.dtype)(x)
        # GNReLU named to preserve the nn.GroupNorm param path.
        return GNReLU(channels=self.nout, groups=self.groups,
                      epsilon=1e-5, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="GroupNorm_0")(x)


class GNReLU(nn.Module):
    """GroupNorm followed by ReLU with an optional fused Pallas path
    (ops/pallas/gn_relu.py). Param tree is byte-identical to
    ``nn.GroupNorm`` (`scale`/`bias` of shape [channels]) so checkpoints
    and the reference weight port interchange freely; the non-fused
    branch literally applies ``nn.GroupNorm`` for exact stock math.

    On TPU with `use_pallas`, GroupNorm's stats pass, the normalise
    pass and the ReLU collapse into one VMEM-resident kernel — the
    activation is read once instead of twice (the decoder stack's
    activations are the top HBM consumers at 64px, see STATUS.md
    roofline table)."""
    channels: int
    groups: int = 8
    epsilon: float = 1e-5
    dtype: Any = None
    use_pallas: bool = False

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.channels,))

    def fused_ok(self, x) -> bool:
        from genesis_tpu.ops.pallas import gn_relu as gnr
        return (self.use_pallas and x.ndim == 4
                and jax.default_backend() == "tpu"
                and gnr.supported(x.shape[1], x.shape[2], x.shape[3],
                                  self.groups))

    def __call__(self, x):
        if self.fused_ok(x):
            from genesis_tpu.ops.pallas import gn_relu as gnr
            return gnr.gn_relu(x, self.scale, self.bias, self.groups,
                               self.epsilon, self.dtype or x.dtype)
        # Stock path: nn.GroupNorm math inlined (f32 reductions, fast
        # variance E[x^2]-E[x]^2, scale/bias per channel, cast to dtype).
        # promote_types (not a hard f32 cast) so float64 parity tests see
        # true f64 math; bf16 still upcasts to f32 for the reductions.
        shape = x.shape
        C = shape[-1]
        gs = C // self.groups
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32)).reshape(
            shape[0], -1, self.groups, gs)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=(1, 3),
                       keepdims=True) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(shape) * self.scale + self.bias
        return nn.relu(y.astype(self.dtype or x.dtype))


class Conv1x1(nn.Module):
    """1x1 conv with params declared in setup so a parent module can
    read `kernel`/`bias` directly (the fused decoder tail folds this
    head into the last GNReLU kernel). Param tree and init match
    ``blocks.Conv(features, 1)`` exactly (`kernel` [1,1,cin,features]
    torch fan-in uniform, `bias` zeros)."""
    cin: int
    features: int
    dtype: Any = None

    def setup(self):
        self.kernel = self.param("kernel", torch_init,
                                 (1, 1, self.cin, self.features))
        self.bias = self.param("bias", zeros_init, (self.features,))

    def __call__(self, x):
        k = self.kernel[0, 0]
        if self.dtype is not None:
            x, k = x.astype(self.dtype), k.astype(self.dtype)
        y = jnp.einsum("nhwc,cf->nhwf", x, k)
        return y + self.bias.astype(y.dtype)


class SemiConv(nn.Module):
    """Gated 1x1 conv + fixed coordinate offset in the last two channels
    (reference blocks.py:167-178). Returns (embedding, delta)."""
    nout: int
    img_size: int

    @nn.compact
    def __call__(self, x):
        out = ScalarGate()(Conv(self.nout, 1)(x))
        delta = out[..., -2:]
        coords = pixel_coords(self.img_size, dtype=out.dtype)
        zeros = jnp.zeros(coords.shape[:-1] + (self.nout - 2,), out.dtype)
        uv = jnp.concatenate([zeros, coords], axis=-1)
        return out + uv, delta
