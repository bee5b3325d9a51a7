"""Decoders: spatial broadcast decoder (reference modules/decoders.py:21-35).

Tile the latent over an (img + 2*layers)^2 grid with coord channels, then
`num_layers` VALID 3x3 convs shrink back to img^2, and a 1x1 head. All convs
are stride-1 NHWC — XLA fuses the activation chain; the grid padding keeps
shapes static.
"""

import jax
from flax import linen as nn

from genesis_tpu.ops import blocks as B

ACTS = {
    "relu": nn.relu,
    "elu": nn.elu,
}


class BroadcastDecoder(nn.Module):
    in_chnls: int
    out_chnls: int
    h_chnls: int
    num_layers: int
    img_dim: int
    act: str = "elu"
    dtype: object = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        import jax.numpy as jnp
        act = ACTS[self.act]
        broad_dim = self.img_dim + 2 * self.num_layers
        x = B.BroadcastLayer(broad_dim)(z)
        x = act(B.Conv(self.h_chnls, 3, padding="VALID",
                       dtype=self.dtype)(x))
        for _ in range(self.num_layers - 1):
            x = act(B.Conv(self.h_chnls, 3, padding="VALID",
                           dtype=self.dtype)(x))
        # 1x1 head in f32 for pixel losses
        return B.Conv(self.out_chnls, 1)(B.upcast_f32(x))
