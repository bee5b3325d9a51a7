"""Slot-conditioned component VAE (reference modules/component_vae.py:27-96).

The K slots are folded into the batch dimension ([K,B,...] -> [K*B,...]) so
the encoder/decoder run as single large NHWC convs on the MXU — the same
batching trick the reference uses via torch.cat along batch, but kept fully
inside one jit so XLA fuses mask-concat + encode + reparam + decode.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.ops import blocks as B
from genesis_tpu.ops.encoders import MONetCompEncoder
from genesis_tpu.ops.decoders import BroadcastDecoder


class ComponentVAE(nn.Module):
    nout: int
    input_channels: int
    img_size: int
    comp_ldim: int = 16
    comp_enc_channels: int = 32
    comp_dec_channels: int = 32
    comp_dec_layers: int = 4
    act: str = "elu"
    pixel_bound: bool = True
    compute_dtype: str = "float32"

    def setup(self):
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        self.encoder_module = MONetCompEncoder(
            input_channels=self.input_channels,
            comp_enc_channels=self.comp_enc_channels,
            comp_ldim=self.comp_ldim, img_size=self.img_size,
            act=self.act, dtype=dt)
        self.decoder_module = BroadcastDecoder(
            in_chnls=self.comp_ldim, out_chnls=self.nout,
            h_chnls=self.comp_dec_channels, num_layers=self.comp_dec_layers,
            img_dim=self.img_size, act=self.act, dtype=dt)

    def encode(self, x, train: bool = True):
        out = self.encoder_module(x, train)
        mu, sigma_ps = jnp.split(out, 2, axis=-1)
        return mu, B.to_sigma(sigma_ps)

    def decode(self, z, train: bool = True):
        x_hat = self.decoder_module(z, train)
        if self.pixel_bound:
            x_hat = jax.nn.sigmoid(x_hat)
        return x_hat

    def __call__(self, x, log_m_k, train: bool = True):
        """x: [B,H,W,C]; log_m_k: [K,B,H,W,1].

        Returns (x_r_k [K,B,H,W,nout], stats{mu_k,sigma_k,z_k: [K,B,ldim]}).
        """
        K, bsz = log_m_k.shape[0], x.shape[0]
        x_tiled = jnp.broadcast_to(x[None], (K,) + x.shape)
        # Concat mask with image along channels, fold K into batch.
        enc_in = jnp.concatenate([log_m_k, x_tiled], axis=-1)
        enc_in = enc_in.reshape((K * bsz,) + enc_in.shape[2:])
        mu, sigma = self.encode(enc_in, train)
        key = self.make_rng("sample")
        z = mu + sigma * jax.random.normal(key, mu.shape, mu.dtype)
        x_r = self.decode(z, train)
        x_r_k = x_r.reshape((K, bsz) + x_r.shape[1:])
        stats = {
            "mu_k": mu.reshape(K, bsz, -1),
            "sigma_k": sigma.reshape(K, bsz, -1),
            "z_k": z.reshape(K, bsz, -1),
        }
        return x_r_k, stats
