"""Encoders (reference modules/encoders.py:22-40).

MONet component encoder: 4 stride-2 3x3 convs (c -> 2c) folding HxW to
(H/16)^2, then a 2-layer MLP to 2*ldim posterior stats. The K slot copies
are folded into the batch dim by the caller, so every conv is one large
MXU-friendly NHWC conv.
"""

from flax import linen as nn

from genesis_tpu.ops import blocks as B
from genesis_tpu.ops.decoders import ACTS


class MONetCompEncoder(nn.Module):
    input_channels: int
    comp_enc_channels: int
    comp_ldim: int
    img_size: int
    act: str = "elu"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = ACTS[self.act]
        c = self.comp_enc_channels
        dt = self.dtype
        x = act(B.Conv(c, 3, 2, 1, dtype=dt)(x))
        x = act(B.Conv(c, 3, 2, 1, dtype=dt)(x))
        x = act(B.Conv(2 * c, 3, 2, 1, dtype=dt)(x))
        x = act(B.Conv(2 * c, 3, 2, 1, dtype=dt)(x))
        x = x.reshape(x.shape[0], -1)
        nhid = max(256, 2 * self.comp_ldim)
        x = act(B.Dense(nhid, dtype=dt)(x))
        # Posterior head in f32
        import jax.numpy as jnp
        return B.Dense(2 * self.comp_ldim)(B.upcast_f32(x))
