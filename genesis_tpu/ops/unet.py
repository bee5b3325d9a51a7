"""UNet feature extractor (reference modules/unet.py:21-90).

Stride-1 3x3 conv blocks with exact-nearest down/up sampling (x[::2] /
repeat-2 — bit-identical to torch F.interpolate nearest), skip concats, and
a 3-layer 128-wide MLP bottleneck. `final_conv` is a 1x1 conv, optionally
disabled (GENESIS-V2 replaces it with Identity, genesisv2_config.py:70).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B


def _channel_plan(num_blocks: int, c: int, in_chnls: int):
    if num_blocks == 4:
        enc_in = [in_chnls, c, 2 * c, 2 * c]
        enc_out = [c, 2 * c, 2 * c, 2 * c]
        dec_out = [2 * c, 2 * c, c, c]
    elif num_blocks == 5:
        enc_in = [in_chnls, c, c, 2 * c, 2 * c]
        enc_out = [c, c, 2 * c, 2 * c, 2 * c]
        dec_out = [2 * c, 2 * c, c, c, c]
    elif num_blocks == 6:
        enc_in = [in_chnls, c, c, c, 2 * c, 2 * c]
        enc_out = [c, c, c, 2 * c, 2 * c, 2 * c]
        dec_out = [2 * c, 2 * c, c, c, c, c]
    else:
        raise ValueError(f"Unsupported num_blocks: {num_blocks}")
    return enc_in, enc_out, dec_out


class UNet(nn.Module):
    num_blocks: int
    img_size: int = 64
    filter_start: int = 32
    in_chnls: int = 4
    out_chnls: int = 1
    norm: str = "in"
    use_final_conv: bool = True
    dtype: Any = None  # computation dtype (bf16 on TPU; params f32)
    use_pallas: bool = False  # fused GN/IN+ReLU Pallas stages (TPU)

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = self.filter_start
        _, enc_out, dec_out = _channel_plan(self.num_blocks, c,
                                            self.in_chnls)
        if self.norm == "in":
            block = B.ConvINReLU
        elif self.norm == "gn":
            block = B.ConvGNReLU
        else:
            block = B.ConvReLU

        batch_size = x.shape[0]
        fm = self.img_size // 2 ** (self.num_blocks - 1)

        # Down path
        skips = []
        for i, o in enumerate(enc_out):
            x = block(nout=o, kernel=3, stride=1, padding=1,
                      dtype=self.dtype, use_pallas=self.use_pallas)(
                          x, train)
            skips.append(x)
            if i < self.num_blocks - 1:
                x = B.down2_nearest(x)

        # MLP bottleneck (Flatten -> 128 -> 128 -> 2c*fm^2, all ReLU)
        h = x.reshape(batch_size, -1)
        h = nn.relu(B.Dense(128, dtype=self.dtype)(h))
        h = nn.relu(B.Dense(128, dtype=self.dtype)(h))
        h = nn.relu(B.Dense(2 * c * fm * fm, dtype=self.dtype)(h))
        x = h.reshape(batch_size, fm, fm, 2 * c)

        # Up path with skip concats
        for i, o in enumerate(dec_out):
            x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
            x = block(nout=o, kernel=3, stride=1, padding=1,
                      dtype=self.dtype, use_pallas=self.use_pallas)(
                          x, train)
            if i < self.num_blocks - 1:
                x = B.up2_nearest(x)

        if self.use_final_conv:
            x = B.Conv(self.out_chnls, 1, dtype=self.dtype)(x)
        return x, None
