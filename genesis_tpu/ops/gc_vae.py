"""Gated-convolution VAE core.

TPU-native re-design of the reference's vendored sylvester VAE
(third_party/sylvester/VAE.py:36-168, layers.py:11-101): a gated conv
encoder (h * sigmoid(g)) to a 256-d feature, Gaussian heads, and a mirrored
gated transposed-conv decoder. Stride schedules per input size follow
VAE.py:56-69. The gated conv computes one conv to 2*nout channels and
splits — a single large MXU matmul per layer, with the gate fused by XLA.

Norm options per reference: {'bn','in',None} applied separately to the h and
g halves (layers.py:42-54).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B


def _stride_table(img_size: int) -> Tuple[int, Sequence[int]]:
    """(last_kernel_size, encoder strides) per input size (VAE.py:56-69)."""
    if img_size == 32:
        return 8, [1, 2, 1, 2, 1]
    if img_size == 64:
        return 16, [1, 2, 1, 2, 1]
    if img_size == 128:
        return 16, [2, 2, 2, 1, 1]
    if img_size == 256:
        return 16, [2, 2, 2, 2, 1]
    raise ValueError(f"Invalid input size: {img_size}")


class GatedConv(nn.Module):
    """conv -> chunk(2, channel) -> h * sigmoid(g), with optional norms."""
    nout: int
    kernel: int
    stride: int = 1
    padding: int = 0
    transpose: bool = False
    h_norm: Optional[str] = None
    g_norm: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.transpose:
            # torch ConvTranspose2d(k, s, p, output_padding=s-1 if p>0
            # else 0): int padding in B.ConvT lowers to the exact
            # torch-aligned asymmetric lax padding (sylvester
            # VAE.py:29-33 uses (5, s, 2, s-1) and the (kz, 1, 0, 0)
            # seed upsample).
            conv = B.ConvT(2 * self.nout, self.kernel, self.stride,
                           self.padding, dtype=self.dtype,
                           output_padding=(self.stride - 1
                                           if self.padding > 0 else 0))
        else:
            conv = B.Conv(2 * self.nout, self.kernel, self.stride,
                          self.padding, dtype=self.dtype)
        h, g = jnp.split(conv(x), 2, axis=-1)
        for which, norm_kind in (("h", self.h_norm), ("g", self.g_norm)):
            factory = B.make_norm(norm_kind)
            if factory is None:
                continue
            layer = factory(name=f"{which}_norm")
            val = h if which == "h" else g
            val = B.apply_norm(layer, val, train)
            if which == "h":
                h = val
            else:
                g = val
        return h * jax.nn.sigmoid(g)


class GatedConvEncoder(nn.Module):
    """Stack of gated convs + final valid gated conv to a flat feature
    (sylvester build_gc_encoder, VAE.py:18-24)."""
    cout: Sequence[int]
    strides: Sequence[int]
    cfc: int            # final feature channels (256)
    kfc: int            # final valid kernel (last_kernel_size)
    norm: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for o, s in zip(self.cout, self.strides):
            x = GatedConv(o, 5, s, 2, h_norm=self.norm,
                          g_norm=self.norm, dtype=self.dtype)(x, train)
        x = GatedConv(self.cfc, self.kfc, 1, 0,
                      dtype=self.dtype)(x, train)  # -> [B,1,1,cfc]
        # Posterior heads and downstream latent math run in f32.
        return B.upcast_f32(x.reshape(x.shape[0], -1))


class GatedConvDecoder(nn.Module):
    """z -> kz x kz seed -> mirrored gated transpose conv stack
    (sylvester build_gc_decoder, VAE.py:27-33)."""
    cin0: int
    cout: Sequence[int]
    strides: Sequence[int]
    kz: int
    norm: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z[:, None, None, :]  # [B,1,1,zdim]
        x = GatedConv(self.cin0, self.kz, 1, 0, transpose=True,
                      dtype=self.dtype)(x, train)
        for o, s in zip(self.cout, self.strides):
            x = GatedConv(o, 5, s, 2, transpose=True, h_norm=self.norm,
                          g_norm=self.norm, dtype=self.dtype)(x, train)
        return x


class GatedConvVAE(nn.Module):
    """The full gated-conv VAE core used by Genesis' attention process and
    the baseline VAE (VAE.py:36-168).

    encode(x) -> (h, mean, var); decode(z) -> nout-channel image.
    """
    z_size: int
    img_size: int
    nout: int
    enc_norm: Optional[str] = None
    dec_norm: Optional[str] = None
    feature_dim: int = 256
    compute_dtype: str = "float32"

    def setup(self):
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        last_kernel, strides = _stride_table(self.img_size)
        self.last_kernel_size = last_kernel
        self.q_z_nn = GatedConvEncoder(
            cout=[32, 32, 64, 64, 64], strides=strides,
            cfc=self.feature_dim, kfc=last_kernel, norm=self.enc_norm,
            dtype=dt)
        self.q_z_mean = B.Dense(self.z_size)
        self.q_z_var_head = B.Dense(self.z_size)
        self.p_x_nn = GatedConvDecoder(
            cin0=64, cout=[64, 32, 32, 32, 32],
            strides=list(reversed(strides)), kz=last_kernel,
            norm=self.dec_norm, dtype=dt)
        self.p_x_mean = B.Conv(self.nout, 1)

    def encode_features(self, x, train: bool = True):
        return self.q_z_nn(x, train)

    def posterior(self, h):
        mean = self.q_z_mean(h)
        var = B.to_var(self.q_z_var_head(h))
        return mean, var

    def encode(self, x, train: bool = True):
        h = self.encode_features(x, train)
        mean, var = self.posterior(h)
        return h, mean, var

    def decode(self, z, train: bool = True):
        # 1x1 head in f32; pixel losses downstream stay f32.
        return self.p_x_mean(
            B.upcast_f32(self.p_x_nn(z, train)))

    def reparameterize(self, mean, var, key):
        sigma = jnp.sqrt(var)
        z = mean + sigma * jax.random.normal(key, mean.shape, mean.dtype)
        return z, sigma

    def __call__(self, x, train: bool = True):
        h, mean, var = self.encode(x, train)
        key = self.make_rng("sample")
        z, sigma = self.reparameterize(mean, var, key)
        x_mean = self.decode(z, train)
        stats = {"x": x_mean, "mu": mean, "sigma": sigma, "z": z}
        return x_mean, stats
