"""Baseline gated-conv VAE (reference models/vae_config.py:40-101)."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.core import flags
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops import blocks as B
from genesis_tpu.ops import losses as L
from genesis_tpu.ops.gc_vae import GatedConvVAE
from genesis_tpu.ops.decoders import BroadcastDecoder
from genesis_tpu.ops.flows import AmortisedPlanarFlow

# GatedConvVAE
flags.DEFINE_integer("latent_dimension", 64, "Latent channels.")
flags.DEFINE_boolean("broadcast_decoder", False,
                     "Use broadcast decoder instead of deconv.")
flags.DEFINE_integer("num_flows", 0,
                     "Planar normalising-flow steps on the latent "
                     "(0 = plain Gaussian posterior, the reference's "
                     "live path).")
# Losses
flags.DEFINE_boolean("pixel_bound", True, "Bound pixel values to [0, 1].")
flags.DEFINE_float("pixel_std", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_string("compute_dtype", "bfloat16",
                    "{float32, bfloat16} - conv/matmul computation dtype.")


def load(cfg):
    cfg.K_steps = None
    return BaselineVAE(
        ldim=cfg.latent_dimension,
        img_size=cfg.img_size,
        pixel_std=cfg.pixel_std,
        pixel_bound=cfg.pixel_bound,
        broadcast_decoder=cfg.get("broadcast_decoder", False),
        input_channels=cfg.get("input_channels", 3),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        num_flows=cfg.get("num_flows", 0),
    )


class _BroadcastPx(nn.Module):
    """Broadcast-decoder replacement for the gated deconv stack
    (reference vae_config.py:53-61)."""
    ldim: int
    img_size: int

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = BroadcastDecoder(in_chnls=self.ldim, out_chnls=64, h_chnls=64,
                             num_layers=4, img_dim=self.img_size,
                             act="elu")(z, train)
        return nn.elu(x)


class BaselineVAE(nn.Module):
    ldim: int
    img_size: int
    pixel_std: float = 0.7
    pixel_bound: bool = True
    broadcast_decoder: bool = False
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    num_flows: int = 0

    K_steps = None

    def setup(self):
        self.vae = GatedConvVAE(
            z_size=self.ldim, img_size=self.img_size,
            nout=self.input_channels,
            compute_dtype=self.compute_dtype)
        if self.broadcast_decoder:
            self.px_nn = _BroadcastPx(self.ldim, self.img_size)
            self.px_mean = B.Conv(self.input_channels, 1)
        if self.num_flows > 0:
            self.flow = AmortisedPlanarFlow(self.ldim, self.num_flows)

    def _decode(self, z, train: bool = True):
        if self.broadcast_decoder:
            return self.px_mean(self.px_nn(z, train))
        return self.vae.decode(z, train)

    def __call__(self, x, train: bool = True):
        h, mean, var = self.vae.encode(x, train)
        key = self.make_rng("sample")
        z0, sigma = self.vae.reparameterize(mean, var, key)
        if self.num_flows > 0:
            # Flow KL (reference vae_config.py:80-86, dead code there as
            # the vendored sylvester base VAE builds no flow layers;
            # live here behind --num_flows): the decoder sees z_K and
            # kl = log q(z_0) - log p(z_K) - sum_k log|det J_k|.
            z, ldj = self.flow(h, z0)
            kl = (jnp.sum(L.normal_log_prob(z0, mean, sigma)
                          - L.std_normal_log_prob(z), axis=-1) - ldj)
        else:
            # No-flow path (the reference's only live branch): z_0 == z_K
            # and ldj == 0 reduce the law above to the plain MC KL.
            z, ldj = z0, None
            kl = jnp.sum(L.normal_log_prob(z, mean, sigma)
                         - L.std_normal_log_prob(z), axis=-1)
        recon = self._decode(z, train)
        if self.pixel_bound:
            recon = jax.nn.sigmoid(recon)
        err = -jnp.sum(L.normal_log_prob(x, recon, self.pixel_std),
                       axis=(1, 2, 3))
        losses = AttrDict(err=err, kl_l=kl)
        stats = AttrDict(recon=recon, x=recon, mu=mean, sigma=sigma, z=z)
        if self.num_flows > 0:
            stats.update(mu_0=mean, sigma_0=sigma, z_0=z0, ldj=ldj)
        return recon, losses, stats, None, None

    def sample(self, batch_size: int, K_steps=None):
        key = self.make_rng("sample")
        z = jax.random.normal(key, (batch_size, self.ldim))
        x = self._decode(z, train=False)
        if self.pixel_bound:
            x = jax.nn.sigmoid(x)
        return x, AttrDict(z=z)

    def get_features(self, x):
        _, _, stats, _, _ = self(x, train=False)
        return stats.z
