"""MONet (reference models/monet_config.py:44-198).

UNet attention with SimpleSBP scope recursion; shared component VAE
reconstructing RGB + mask-logit; Categorical mask KL between attention and
reconstructed masks.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.core import flags
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops import losses as L
from genesis_tpu.ops.attention import SimpleSBP
from genesis_tpu.ops.component_vae import ComponentVAE
from genesis_tpu.ops.unet import UNet

# Attention network
flags.DEFINE_integer("filter_start", 32,
                     "Starting number of channels in UNet.")
flags.DEFINE_string("prior_mode", "softmax", "{scope, softmax}")
# Shared with other models
flags.DEFINE_boolean("pixel_bound", True, "Bound pixel values to [0, 1].")
flags.DEFINE_float("pixel_std1", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_float("pixel_std2", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_boolean("montecarlo_kl", True, "Evaluate KL via MC samples.")
flags.DEFINE_integer("comp_enc_channels", 32, "Starting number of channels.")
flags.DEFINE_integer("comp_ldim", 16, "Latent dimension of the VAE.")
flags.DEFINE_integer("comp_dec_channels", 32,
                     "Num channels in Broadcast Decoder.")
flags.DEFINE_integer("comp_dec_layers", 4,
                     "Num layers in Broadcast Decoder.")
flags.DEFINE_string("compute_dtype", "bfloat16",
                    "{float32, bfloat16} - conv/matmul computation dtype.")


def load(cfg):
    return MONet(
        K_steps=cfg.K_steps,
        img_size=cfg.img_size,
        filter_start=cfg.get("filter_start", 32),
        prior_mode=cfg.get("prior_mode", "softmax"),
        pixel_bound=cfg.pixel_bound,
        pixel_std1=cfg.pixel_std1,
        pixel_std2=cfg.pixel_std2,
        comp_ldim=cfg.comp_ldim,
        comp_enc_channels=cfg.comp_enc_channels,
        comp_dec_channels=cfg.comp_dec_channels,
        comp_dec_layers=cfg.comp_dec_layers,
        input_channels=cfg.get("input_channels", 3),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        debug=cfg.get("debug", False),
    )


class MONet(nn.Module):
    K_steps: int
    img_size: int
    filter_start: int = 32
    prior_mode: str = "softmax"
    pixel_bound: bool = True
    pixel_std1: float = 0.7
    pixel_std2: float = 0.7
    comp_ldim: int = 16
    comp_enc_channels: int = 32
    comp_dec_channels: int = 32
    comp_dec_layers: int = 4
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    debug: bool = False

    def setup(self):
        dt = (jnp.bfloat16 if self.compute_dtype == "bfloat16" else None)
        core = UNet(
            num_blocks=int(math.log2(self.img_size) - 1),
            img_size=self.img_size,
            filter_start=self.filter_start,
            in_chnls=self.input_channels + 1,
            out_chnls=1,
            norm="in",
            dtype=dt)
        self.att_process = SimpleSBP(core=core)
        # Component VAE reconstructs RGB + mask logit; the pixel bound is
        # applied here to the RGB channels only (monet_config.py:67-68,85-89)
        self.comp_vae = ComponentVAE(
            nout=self.input_channels + 1,
            input_channels=self.input_channels,
            img_size=self.img_size,
            comp_ldim=self.comp_ldim,
            comp_enc_channels=self.comp_enc_channels,
            comp_dec_channels=self.comp_dec_channels,
            comp_dec_layers=self.comp_dec_layers,
            act="relu",
            pixel_bound=False,
            compute_dtype=self.compute_dtype)

    def _std(self):
        std = jnp.full((self.K_steps,), self.pixel_std2, jnp.float32)
        return std.at[0].set(self.pixel_std1)

    def __call__(self, x, train: bool = True):
        nin = self.input_channels
        # --- Predict segmentation masks ---
        log_m_k, log_s_k, att_stats = self.att_process(
            x, self.K_steps - 1, train)

        # --- Reconstruct components (K folded into batch) ---
        x_m_r_k, comp_stats = self.comp_vae(x, log_m_k, train)
        x_r_k = x_m_r_k[..., :nin]
        m_r_logits_k = x_m_r_k[..., nin:]
        if self.pixel_bound:
            x_r_k = jax.nn.sigmoid(x_r_k)

        # --- Reconstruct input image by marginalising ---
        recon = jnp.sum(jnp.exp(log_m_k) * x_r_k, axis=0)

        # --- Reconstruct masks ---
        log_m_r_k = L.get_mask_recon_stack(
            m_r_logits_k, self.prior_mode, log=True)

        # --- Loss terms ---
        losses = AttrDict()
        losses["err"] = L.x_loss(x, log_m_k, x_r_k, self._std())
        losses["kl_m"] = L.kl_m_loss(log_m_k=log_m_k, log_m_r_k=log_m_r_k)
        losses["kl_l_k"] = L.get_mc_kl(
            comp_stats["z_k"], comp_stats["mu_k"], comp_stats["sigma_k"],
            jnp.zeros_like(comp_stats["z_k"]),
            jnp.ones_like(comp_stats["z_k"]))

        if self.debug:
            # Reference monet_config.py:122-126: mask-sum invariants on
            # both stacks under debug.
            from genesis_tpu.ops import debug_checks
            debug_checks.check_log_masks(log_m_k, "log_m_k")
            debug_checks.check_log_masks(log_m_r_k, "log_m_r_k")

        stats = AttrDict(
            recon=recon, log_m_k=log_m_k, log_s_k=log_s_k, x_r_k=x_r_k,
            log_m_r_k=log_m_r_k,
            mx_r_k=x_r_k * jnp.exp(log_m_k))
        return recon, losses, stats, AttrDict(att_stats), \
            AttrDict(comp_stats)

    def sample(self, batch_size: int, K_steps=None):
        K_steps = self.K_steps if K_steps is None else K_steps
        nin = self.input_channels
        key = self.make_rng("sample")
        z = jax.random.normal(key, (K_steps * batch_size, self.comp_ldim))
        x_hat = self.comp_vae.decode(z, train=False)
        x_hat = x_hat.reshape((K_steps, batch_size) + x_hat.shape[1:])
        x_r_k = x_hat[..., :nin]
        m_r_logits_k = x_hat[..., nin:]
        if self.pixel_bound:
            x_r_k = jax.nn.sigmoid(x_r_k)
        m_r_stack = L.get_mask_recon_stack(
            m_r_logits_k, self.prior_mode, log=False)
        gen_image = jnp.sum(m_r_stack * x_r_k, axis=0)
        log_m_r_k = jnp.log(jnp.maximum(m_r_stack, 1e-30))
        stats = AttrDict(gen_image=gen_image, x_k=x_r_k, log_m_k=log_m_r_k,
                         mx_k=x_r_k * m_r_stack)
        return gen_image, stats

    def get_features(self, x):
        _, _, _, _, comp_stats = self(x, train=False)
        z_k = comp_stats["z_k"]  # [K,B,D]
        return jnp.concatenate(list(z_k), axis=-1)
