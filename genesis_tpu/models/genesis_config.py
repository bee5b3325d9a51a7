"""GENESIS (reference models/genesis_config.py:59-436).

Two-stage autoregressive scene model: latent stick-breaking attention (a
gated-conv VAE with an LSTM over mask latents) followed by a component VAE
per slot; autoregressive LSTM prior over mask latents; optional MLP
component prior; mixture-of-Gaussians reconstruction NLL; ancestral
sampling.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.core import flags
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops import blocks as B
from genesis_tpu.ops import losses as L
from genesis_tpu.ops.attention import LatentSBP
from genesis_tpu.ops.component_vae import ComponentVAE
from genesis_tpu.ops.decoders import BroadcastDecoder
from genesis_tpu.ops.gc_vae import (GatedConvVAE, GatedConvEncoder,
                                    GatedConvDecoder, _stride_table)
from genesis_tpu.ops.losses import AutoregPrior

# Model type
flags.DEFINE_boolean("two_stage", True, "Use two stages if two, else one.")
# Priors
flags.DEFINE_boolean("autoreg_prior", True, "Autoregressive prior.")
flags.DEFINE_boolean("comp_prior", True, "Component prior.")
# Attention VAE
flags.DEFINE_integer("attention_latents", 64, "Latent dimension.")
flags.DEFINE_string("enc_norm", "bn", "{bn, in} - norm type in encoder.")
flags.DEFINE_string("dec_norm", "bn", "{bn, in} - norm type in decoder.")
# Component VAE
flags.DEFINE_integer("comp_enc_channels", 32, "Starting number of channels.")
flags.DEFINE_integer("comp_ldim", 16, "Latent dimension of the VAE.")
flags.DEFINE_integer("comp_dec_channels", 32,
                     "Num channels in Broadcast Decoder.")
flags.DEFINE_integer("comp_dec_layers", 4,
                     "Num layers in Broadcast Decoder.")
flags.DEFINE_boolean("comp_symmetric", False,
                     "Use same encoder/decoder as in attention VAE.")
# Losses
flags.DEFINE_boolean("pixel_bound", True, "Bound pixel values to [0, 1].")
flags.DEFINE_float("pixel_std1", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_float("pixel_std2", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_boolean("montecarlo_kl", True, "Evaluate KL via MC samples.")
flags.DEFINE_integer("scan_unroll", 0,
                     "Unroll factor for the serial K-step scans "
                     "(0 = full unroll: best step time; 1 = true scan: "
                     "fastest XLA compile at large K/resolution).")
flags.DEFINE_string("compute_dtype", "bfloat16",
                    "{float32, bfloat16} - conv/matmul computation dtype.")


def load(cfg):
    assert cfg.get("montecarlo_kl", True), "ALWAYS use MC for estimating KL"
    return Genesis(
        K_steps=cfg.K_steps,
        img_size=cfg.img_size,
        two_stage=cfg.get("two_stage", True),
        autoreg_prior=cfg.get("autoreg_prior", True),
        comp_prior=cfg.get("comp_prior", True),
        ldim=cfg.get("attention_latents", 64),
        enc_norm=cfg.get("enc_norm", "bn"),
        dec_norm=cfg.get("dec_norm", "bn"),
        comp_ldim=cfg.comp_ldim,
        comp_enc_channels=cfg.comp_enc_channels,
        comp_dec_channels=cfg.comp_dec_channels,
        comp_dec_layers=cfg.comp_dec_layers,
        comp_symmetric=cfg.get("comp_symmetric", False),
        pixel_bound=cfg.pixel_bound,
        pixel_std1=cfg.pixel_std1,
        pixel_std2=cfg.pixel_std2,
        input_channels=cfg.get("input_channels", 3),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        scan_unroll=cfg.get("scan_unroll", 0),
        debug=cfg.get("debug", False),
    )


class _SymmetricEncoder(nn.Module):
    """Gated-conv component encoder for comp_symmetric mode
    (genesis_config.py:102-110)."""
    comp_ldim: int
    last_kernel: int
    norm: Optional[str]

    @nn.compact
    def __call__(self, x, train: bool = True):
        return GatedConvEncoder(
            cout=[32, 32, 64, 64, 64], strides=[1, 2, 1, 2, 1],
            cfc=2 * self.comp_ldim, kfc=self.last_kernel,
            norm=self.norm)(x, train)


class _SymmetricDecoder(nn.Module):
    """Gated-conv component decoder for comp_symmetric mode
    (genesis_config.py:111-120)."""
    nout: int
    last_kernel: int
    norm: Optional[str]

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = GatedConvDecoder(
            cin0=64, cout=[64, 32, 32, 32, 32], strides=[1, 2, 1, 2, 1],
            kz=self.last_kernel, norm=self.norm)(z, train)
        return B.Conv(self.nout, 1)(x)


class Genesis(nn.Module):
    K_steps: int
    img_size: int
    two_stage: bool = True
    autoreg_prior: bool = True
    comp_prior: bool = True
    ldim: int = 64
    enc_norm: str = "bn"
    dec_norm: str = "bn"
    comp_ldim: int = 16
    comp_enc_channels: int = 32
    comp_dec_channels: int = 32
    comp_dec_layers: int = 4
    comp_symmetric: bool = False
    pixel_bound: bool = True
    pixel_std1: float = 0.7
    pixel_std2: float = 0.7
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    scan_unroll: int = 0
    debug: bool = False

    def setup(self):
        assert self.K_steps > 1
        # - Attention core + process (genesis_config.py:87-96)
        att_core = GatedConvVAE(
            z_size=self.ldim, img_size=self.img_size, nout=1,
            enc_norm=self.enc_norm, dec_norm=self.dec_norm,
            compute_dtype=self.compute_dtype)
        self.att_process = LatentSBP(core=att_core,
                             scan_unroll=self.scan_unroll)
        # - Component stage (genesis_config.py:98-126)
        if self.two_stage:
            if self.comp_symmetric:
                last_kernel, _ = _stride_table(self.img_size)
                self.sym_encoder = _SymmetricEncoder(
                    self.comp_ldim, last_kernel, self.enc_norm)
                self.sym_decoder = _SymmetricDecoder(
                    self.input_channels, last_kernel, self.dec_norm)
            else:
                self.comp_vae = ComponentVAE(
                    nout=self.input_channels,
                    input_channels=self.input_channels,
                    img_size=self.img_size,
                    comp_ldim=self.comp_ldim,
                    comp_enc_channels=self.comp_enc_channels,
                    comp_dec_channels=self.comp_dec_channels,
                    comp_dec_layers=self.comp_dec_layers,
                    act="elu", pixel_bound=self.pixel_bound,
                    compute_dtype=self.compute_dtype)
        else:
            dt = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                  else None)
            self.decoder = BroadcastDecoder(
                in_chnls=self.ldim, out_chnls=self.input_channels,
                h_chnls=self.comp_dec_channels,
                num_layers=self.comp_dec_layers,
                img_dim=self.img_size, act="elu", dtype=dt)

        # - Priors (genesis_config.py:128-138)
        if self.autoreg_prior:
            # rollout_tanh_mu=False: reference Genesis.sample uses the
            # raw linear output as the prior mean (genesis_config.py:
            # 355-357), unlike its own KL path and GenesisV2.sample.
            self.prior = AutoregPrior(ldim=self.ldim, hidden=256,
                          scan_unroll=self.scan_unroll,
                          rollout_tanh_mu=False)
        if self._use_comp_prior():
            self.prior_mlp = nn.Sequential([
                B.Dense(256), nn.elu,
                B.Dense(256), nn.elu,
                B.Dense(2 * self.comp_ldim)])

    def _use_comp_prior(self):
        return self.comp_prior and self.two_stage and self.K_steps > 1

    def _std(self):
        std = jnp.full((self.K_steps,), self.pixel_std2, jnp.float32)
        return std.at[0].set(self.pixel_std1)

    def _corrected_masks(self, log_m, log_s):
        """Run for K att steps -> K+1 masks; drop the last and replace slot
        K-1 with its scope (genesis_config.py:167-171)."""
        K = self.K_steps
        return jnp.concatenate([log_m[:K - 1], log_s[K - 1:K]], axis=0)

    def _comp_decode(self, z, train: bool = True):
        if self.comp_symmetric:
            x = self.sym_decoder(z, train)
            return jax.nn.sigmoid(x) if self.pixel_bound else x
        return self.comp_vae.decode(z, train)

    def _comp_forward(self, x, log_m_k, train: bool = True):
        if not self.comp_symmetric:
            return self.comp_vae(x, log_m_k, train)
        # Symmetric gated-conv encoder/decoder path.
        K, bsz = log_m_k.shape[0], x.shape[0]
        x_tiled = jnp.broadcast_to(x[None], (K,) + x.shape)
        enc_in = jnp.concatenate([log_m_k, x_tiled], axis=-1)
        enc_in = enc_in.reshape((K * bsz,) + enc_in.shape[2:])
        out = self.sym_encoder(enc_in, train)
        mu, sigma_ps = jnp.split(out, 2, axis=-1)
        sigma = B.to_sigma(sigma_ps)
        key = self.make_rng("sample")
        z = mu + sigma * jax.random.normal(key, mu.shape, mu.dtype)
        x_r = self._comp_decode(z, train)
        x_r_k = x_r.reshape((K, bsz) + x_r.shape[1:])
        stats = {"mu_k": mu.reshape(K, bsz, -1),
                 "sigma_k": sigma.reshape(K, bsz, -1),
                 "z_k": z.reshape(K, bsz, -1)}
        return x_r_k, stats

    def __call__(self, x, train: bool = True):
        # --- Predict segmentation masks (K attention steps) ---
        log_m_raw, log_s_k, att_stats = self.att_process(
            x, self.K_steps, train)
        log_m_k = self._corrected_masks(log_m_raw, log_s_k)
        zm_k = att_stats["z_k"]                     # [K, B, ldim]

        # --- Reconstruct components ---
        if self.two_stage:
            x_r_k, comp_stats = self._comp_forward(x, log_m_k, train)
            comp_stats = AttrDict(comp_stats)
        else:
            K, bsz = self.K_steps, x.shape[0]
            x_r = self.decoder(zm_k.reshape(K * bsz, -1), train)
            x_r = x_r.reshape((K, bsz) + x_r.shape[1:])
            x_r_k = jax.nn.sigmoid(x_r) if self.pixel_bound else x_r
            comp_stats = None

        # --- Reconstruct input image by marginalising ---
        recon = jnp.sum(jnp.exp(log_m_k) * x_r_k, axis=0)

        # --- Loss terms ---
        losses = AttrDict()
        losses["err"] = L.x_loss(x, log_m_k, x_r_k, self._std())

        # -- Attention mask KL (MC, autoregressive LSTM prior)
        kl_m_k, p_mu, p_sigma = L.mask_latent_loss(
            att_stats["mu_k"], att_stats["sigma_k"], zm_k,
            prior=self.prior if self.autoreg_prior else None)
        losses["kl_m_k"] = kl_m_k
        att_stats = AttrDict(att_stats)
        att_stats["pmu_k"] = p_mu
        att_stats["psigma_k"] = p_sigma

        # -- Component KL
        if self.two_stage:
            zl = comp_stats["z_k"]                  # [K, B, comp_ldim]
            if self._use_comp_prior():
                mlp_out = self.prior_mlp(zm_k)      # [K, B, 2*comp_ldim]
                cp_mu_raw, cp_sigma_raw = jnp.split(mlp_out, 2, axis=-1)
                cp_mu = jnp.tanh(cp_mu_raw)
                cp_sigma = B.to_prior_sigma(cp_sigma_raw)
                comp_stats["pmu_k"] = cp_mu
                comp_stats["psigma_k"] = cp_sigma
            else:
                cp_mu = jnp.zeros_like(zl)
                cp_sigma = jnp.ones_like(zl)
            losses["kl_l_k"] = L.get_mc_kl(
                zl, comp_stats["mu_k"], comp_stats["sigma_k"],
                cp_mu, cp_sigma)

        if self.debug or not train:
            # Reference genesis_config.py:267-269: mask-sum invariant on
            # every forward under debug or eval.
            from genesis_tpu.ops import debug_checks
            debug_checks.check_log_masks(log_m_k, "log_m_k")

        stats = AttrDict(
            recon=recon, log_m_k=log_m_k, log_s_k=log_s_k, x_r_k=x_r_k,
            mx_r_k=x_r_k * jnp.exp(log_m_k))
        return recon, losses, stats, att_stats, comp_stats

    def sample(self, batch_size: int, K_steps=None):
        K = self.K_steps if K_steps is None else K_steps
        key = self.make_rng("sample")
        k_mask, k_comp = jax.random.split(key)

        # --- Mask latents (genesis_config.py:349-367) ---
        if self.autoreg_prior:
            zm_k = self.prior.rollout(k_mask, batch_size, K)
        else:
            zm_k = jax.random.normal(
                k_mask, (K, batch_size, self.ldim))
        log_m_raw, log_s_k, _ = self.att_process.masks_from_zm_k(zm_k)
        # Mask correction at the sampled K (genesis_config.py:371-375)
        log_m_k = jnp.concatenate(
            [log_m_raw[:K - 1], log_s_k[K - 1:K]], axis=0)

        # --- Component appearances ---
        if self.two_stage:
            if self._use_comp_prior():
                mlp_out = self.prior_mlp(zm_k)
                mu_raw, sigma_raw = jnp.split(mlp_out, 2, axis=-1)
                mu = jnp.tanh(mu_raw)
                sigma = B.to_prior_sigma(sigma_raw)
                zc_k = mu + sigma * jax.random.normal(k_comp, mu.shape)
            else:
                zc_k = jax.random.normal(
                    k_comp, (K, batch_size, self.comp_ldim))
            x_flat = self._comp_decode(
                zc_k.reshape(K * batch_size, -1), train=False)
            x_k = x_flat.reshape((K, batch_size) + x_flat.shape[1:])
        else:
            x_flat = self.decoder(
                zm_k.reshape(K * batch_size, -1), train=False)
            x_k = x_flat.reshape((K, batch_size) + x_flat.shape[1:])
            if self.pixel_bound:
                x_k = jax.nn.sigmoid(x_k)

        # Reference genesis_config.py:385 checks unconditionally in sample.
        from genesis_tpu.ops import debug_checks
        debug_checks.check_log_masks(log_m_k, "sampled log_m_k")

        gen_image = jnp.sum(jnp.exp(log_m_k) * x_k, axis=0)
        stats = AttrDict(x_k=x_k, log_m_k=log_m_k, log_s_k=log_s_k,
                         mx_k=x_k * jnp.exp(log_m_k))
        return gen_image, stats

    def get_features(self, x):
        _, _, _, att_stats, comp_stats = self(x, train=False)
        if self.two_stage:
            zm = att_stats["z_k"][:self.K_steps - 1]
            zc = comp_stats["z_k"]
            parts = list(zm) + list(zc)
        else:
            parts = list(att_stats["z_k"])
        return jnp.concatenate(parts, axis=-1)
