"""GENESIS-V2 (reference models/genesisv2_config.py:49-256).

Non-iterative slot inference: UNet feature encoder -> IC-SBP kernel
attention clustering -> masked-mean slot pooling -> z_head posterior ->
shared broadcast-style deconv decoder emitting RGB + mask-logit; softmax
mask recombination; autoregressive LSTM prior.

TPU re-design notes: the per-slot pooling loop (genesisv2_config.py:146-161)
is one einsum over [K,B,H,W]; the per-slot decoder loop (205-211) folds K
into the batch for a single MXU-batched deconv stack; IC-SBP `dynamic_K`
works batched (see ops/attention.py) instead of per-element.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from genesis_tpu.core import flags
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops import blocks as B
from genesis_tpu.ops import losses as L
from genesis_tpu.ops.attention import LOG_ZERO, InstanceColouringSBP
from genesis_tpu.ops.losses import AutoregPrior
from genesis_tpu.ops.unet import UNet

# Architecture
flags.DEFINE_integer("feat_dim", 64, "Number of features and latents.")
# Segmentation
flags.DEFINE_string("kernel", "gaussian",
                    "{laplacian, gaussian, epanechnikov}")
flags.DEFINE_boolean("semiconv", True, "Use semi-convolutional embeddings.")
flags.DEFINE_boolean("dynamic_K", False, "Dynamic K.")
flags.DEFINE_boolean("pallas_icsbp", True,
                     "Run IC-SBP as the fused Pallas kernel (TPU only; "
                     "auto-falls back above 128px / non-lane-aligned).")
flags.DEFINE_boolean("pallas_gn", False,
                     "Fuse every GroupNorm+ReLU stage (encoder UNet "
                     "blocks, seg/feat heads, decoder stack — the 1x1 "
                     "RGBA head folds into the last decoder stage) as "
                     "Pallas kernels (TPU only; auto-falls back per "
                     "stage when a block exceeds VMEM).")
# Auxiliary mask consistency loss
flags.DEFINE_boolean("klm_loss", False, "KL mask regulariser.")
flags.DEFINE_boolean("detach_mr_in_klm", True,
                     "Detach reconstructed masks.")
# Shared flags (may already be registered by other model configs)
flags.DEFINE_boolean("autoreg_prior", True, "Autoregressive prior.")
flags.DEFINE_boolean("pixel_bound", True, "Bound pixel values to [0, 1].")
flags.DEFINE_float("pixel_std1", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_float("pixel_std2", 0.7, "StdDev of reconstructed pixels.")
flags.DEFINE_integer("scan_unroll", 0,
                     "Unroll factor for the serial K-step scans "
                     "(0 = full unroll: best step time; 1 = true scan: "
                     "fastest XLA compile at large K/resolution).")
flags.DEFINE_string("compute_dtype", "bfloat16",
                    "{float32, bfloat16} - conv/matmul computation dtype "
                    "(params and losses stay float32).")
flags.DEFINE_string("slot_dtype", "float32",
                    "{float32, bfloat16} - storage dtype of the "
                    "slot-stacked [K,B,H,W,*] decode/mask tensors (the "
                    "dominant HBM traffic, see STATUS byte audit). "
                    "bfloat16 halves that traffic; loss math still "
                    "accumulates in float32 (x_loss promotes, the mask "
                    "log-softmax and recon sum are computed in f32). "
                    "Training-perf knob: eval/visualisation CLIs should "
                    "keep the float32 default.")


def load(cfg):
    assert cfg.pixel_std1 == cfg.pixel_std2
    return GenesisV2(
        K_steps=cfg.K_steps,
        img_size=cfg.img_size,
        feat_dim=cfg.get("feat_dim", 64),
        kernel=cfg.get("kernel", "gaussian"),
        semiconv=cfg.get("semiconv", True),
        dynamic_K=cfg.get("dynamic_K", False),
        dynamic_K_threshold=cfg.get("dynamic_K_threshold", 20.0),
        pallas_icsbp=cfg.get("pallas_icsbp", True),
        pallas_gn=cfg.get("pallas_gn", False),
        klm_loss=cfg.get("klm_loss", False),
        detach_mr_in_klm=cfg.get("detach_mr_in_klm", True),
        autoreg_prior=cfg.get("autoreg_prior", True),
        pixel_bound=cfg.pixel_bound,
        pixel_std=cfg.pixel_std1,
        input_channels=cfg.get("input_channels", 3),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        slot_dtype=cfg.get("slot_dtype", "float32"),
        scan_unroll=cfg.get("scan_unroll", 0),
        debug=cfg.get("debug", False),
    )


class GenesisV2(nn.Module):
    K_steps: int
    img_size: int
    feat_dim: int = 64
    kernel: str = "gaussian"
    semiconv: bool = True
    dynamic_K: bool = False
    dynamic_K_threshold: float = 20.0
    pallas_icsbp: bool = True
    pallas_gn: bool = False
    klm_loss: bool = False
    detach_mr_in_klm: bool = True
    autoreg_prior: bool = True
    pixel_bound: bool = True
    pixel_std: float = 0.7
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    slot_dtype: str = "float32"
    scan_unroll: int = 0
    debug: bool = False

    def setup(self):
        F = self.feat_dim
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        self._dt = dt
        self.encoder = UNet(
            num_blocks=int(math.log2(self.img_size) - 1),
            img_size=self.img_size,
            filter_start=min(F, 64),
            in_chnls=self.input_channels,
            out_chnls=F,
            norm="gn",
            use_final_conv=False,  # final_conv = Identity (v2_config.py:70)
            dtype=dt,
            use_pallas=self.pallas_gn)
        self.att_process = InstanceColouringSBP(
            img_size=self.img_size,
            kernel=self.kernel,
            colour_dim=8,
            K_steps=self.K_steps,
            feat_dim=F,
            semiconv=self.semiconv,
            dynamic_K_threshold=self.dynamic_K_threshold,
            use_pallas=self.pallas_icsbp,
            scan_unroll=self.scan_unroll,
            debug=self.debug)
        self.seg_head = B.ConvGNReLU(nout=F, kernel=3, stride=1,
                                     padding=1, dtype=dt,
                                     use_pallas=self.pallas_gn)
        self.feat_head_conv = B.ConvGNReLU(nout=F, kernel=3, stride=1,
                                           padding=1, dtype=dt,
                                           use_pallas=self.pallas_gn)
        self.feat_head_out = B.Conv(2 * F, 1, dtype=dt)
        self.z_head = nn.Sequential([
            nn.LayerNorm(epsilon=1e-5),  # torch LayerNorm eps parity
            B.Dense(2 * F), nn.relu,
            B.Dense(2 * F)])
        # Decoder: broadcast to img/16 then 4 stride-2 deconvs + 1x1 head.
        c = F
        # torch ConvTranspose2d(k5, s2, p2, op1) alignment (int padding
        # lowers to the asymmetric ((2,3),(2,3)) lax padding; 'SAME'
        # would be shifted one pixel relative to the reference).
        self.dec_convs = [B.ConvT(c, 5, 2, 2, dtype=dt),
                          B.ConvT(c, 5, 2, 2, dtype=dt),
                          B.ConvT(min(c, 64), 5, 2, 2, dtype=dt),
                          B.ConvT(min(c, 64), 5, 2, 2, dtype=dt)]
        # GNReLU/Conv1x1 are param-tree drop-ins for nn.GroupNorm /
        # B.Conv with an optional fused Pallas path (pallas_gn): each
        # decoder activation is read once per stage instead of twice,
        # and the last stage folds the 1x1 RGBA head so the full-size
        # [K*B,H,W,C] ReLU output never round-trips through HBM.
        dec_chnls = [c, c, min(c, 64), min(c, 64)]
        self.dec_norms = [B.GNReLU(channels=ch, groups=8, epsilon=1e-5,
                                   dtype=dt, use_pallas=self.pallas_gn)
                          for ch in dec_chnls]
        self.dec_broadcast = B.BroadcastLayer(self.img_size // 16)
        # slot_dtype=bfloat16 emits the [K*B,H,W,C+1] decode directly in
        # bf16 (the head einsum runs bf16 too) so the dominant slot
        # traffic is stored half-width; default None keeps the stock f32
        # head math byte-exact for the parity tests.
        sdt = jnp.bfloat16 if self.slot_dtype == "bfloat16" else None
        self.dec_head = B.Conv1x1(cin=min(c, 64),
                                  features=self.input_channels + 1,
                                  dtype=sdt)
        # Prior
        if self.autoreg_prior and self.K_steps > 1:
            self.prior = AutoregPrior(ldim=F, hidden=4 * F,
                          scan_unroll=self.scan_unroll)

    @staticmethod
    def tp_rules():
        """Tensor-parallel sharding rules for the `model` mesh axis
        (SURVEY.md section 2.3 TP row): output channels of the decoder
        deconv stack, the z_head posterior Denses and the UNet MLP
        bottleneck shard over `model`; GSPMD partitions the matmuls and
        inserts the collectives. Applied by train.step.shard_state when
        model_parallel > 1."""
        from jax.sharding import PartitionSpec as P
        return [
            (r"dec_convs_\d+/kernel", P(None, None, None, "model")),
            (r"z_head/layers_\d+/kernel", P(None, "model")),
            (r"encoder/Dense_\d+/kernel", P(None, "model")),
        ]

    # -- Decoder over K-folded batch ------------------------------------
    def _decoder_module(self, z, train: bool = True):
        from genesis_tpu.ops.pallas import gn_relu as gnr
        x = self.dec_broadcast(z)
        for i, (conv, norm) in enumerate(zip(self.dec_convs,
                                             self.dec_norms)):
            x = conv(x)
            if i == 3 and norm.fused_ok(x):
                # Fused tail: GN+ReLU+1x1 head in one kernel.
                return gnr.gn_relu_head(
                    x, norm.scale, norm.bias,
                    self.dec_head.kernel[0, 0], self.dec_head.bias,
                    norm.groups, norm.epsilon)
            x = norm(x)
        return self.dec_head(x)

    def decode_latents(self, z_k, train: bool = True, live=None):
        """z_k: [K,B,F] -> (recon, x_r_k [K,B,H,W,C], log_m_r_k
        [K,B,H,W,1]) (genesisv2_config.py:205-225). `live` [K,B] masks
        dead dynamic_K slots out of the softmax recombination so the
        reconstruction equals the reference's batch-1 truncated decode."""
        nin = self.input_channels
        K, bsz = z_k.shape[0], z_k.shape[1]
        dec = self._decoder_module(z_k.reshape(K * bsz, -1), train)
        if self.slot_dtype == "bfloat16":
            # Perf lever (STATUS byte audit): keep the slot-stacked
            # decode in bf16 — halves the dominant HBM traffic. The
            # mask chain below upcasts its 1-of-C+1 logit channel so
            # the log-softmax stays f32-exact, and x_loss/recon promote
            # to f32 on contact with the f32 image/log-masks, so loss
            # accumulation is unchanged in dtype.
            dec = dec.astype(jnp.bfloat16)
        else:
            dec = B.upcast_f32(dec)  # losses/masks f32 (f64 under parity)
        dec = dec.reshape((K, bsz) + dec.shape[1:])
        x_r_k = dec[..., :nin]
        m_r_logits_k = B.upcast_f32(dec[..., nin:])
        if live is not None:
            m_r_logits_k = jnp.where(
                live[:, :, None, None, None], m_r_logits_k, LOG_ZERO)
        if self.pixel_bound:
            x_r_k = jax.nn.sigmoid(x_r_k)
        log_m_r_k = L.get_mask_recon_stack(m_r_logits_k, "softmax",
                                           log=True)
        recon = jnp.sum(jnp.exp(log_m_r_k) * x_r_k, axis=0)
        return recon, x_r_k, log_m_r_k

    def __call__(self, x, train: bool = True):
        # --- Extract features ---
        enc_feat, _ = self.encoder(x, train)
        enc_feat = nn.relu(enc_feat)

        # Attention math (SBP log-space recursion) and pooling stay f32.

        # --- Predict attention masks (IC-SBP) ---
        seg_feat = B.upcast_f32(self.seg_head(enc_feat, train))
        log_m_k, log_s_k, att_stats = self.att_process(
            seg_feat, self.K_steps - 1, train,
            dynamic_K=self.dynamic_K)
        # Slot liveness under dynamic_K: a dead (dropped) slot is all
        # LOG_ZERO. Reference batch-1 semantics drop dead slots entirely
        # (attention.py:218-219, genesisv2_config.py:118-137); we keep the
        # static [K] shape but exclude dead slots from the decode softmax
        # and the latent KL so losses match the batch-1 law exactly (the
        # LSTM prior is causal, so truncation == masking for live slots).
        live = (jnp.any(log_m_k > 0.5 * LOG_ZERO, axis=(2, 3, 4))
                if self.dynamic_K else None)          # [K,B] bool

        # --- Object features, latents (vectorised slot pooling) ---
        masks = jnp.exp(log_m_k)                       # [K,B,H,W,1]
        feat = self.feat_head_out(self.feat_head_conv(enc_feat, train))
        feat = B.upcast_f32(feat)
        obj_sum = jnp.einsum("kbhwi,bhwc->kbc", masks, feat)
        mask_sum = jnp.sum(masks, axis=(2, 3, 4))      # [K,B]
        obj_feat = obj_sum / (mask_sum[..., None] + 1e-5)
        mu, sigma_ps = jnp.split(self.z_head(obj_feat), 2, axis=-1)
        sigma = B.to_sigma(sigma_ps)
        key = self.make_rng("sample")
        z_k = mu + sigma * jax.random.normal(key, mu.shape, mu.dtype)
        comp_stats = AttrDict(mu_k=mu, sigma_k=sigma, z_k=z_k)

        # --- Decode latents ---
        recon, x_r_k, log_m_r_k = self.decode_latents(z_k, train,
                                                      live=live)

        # --- Loss terms ---
        losses = AttrDict()
        losses["err"] = L.x_loss(x, log_m_r_k, x_r_k, self.pixel_std)
        if self.klm_loss:
            lm_r = (jax.lax.stop_gradient(log_m_r_k)
                    if self.detach_mr_in_klm else log_m_r_k)
            losses["kl_m"] = L.kl_m_loss(log_m_k=log_m_k, log_m_r_k=lm_r)
        kl_l_k, p_mu, p_sigma = L.mask_latent_loss(
            mu, sigma, z_k,
            prior=self.prior if (self.autoreg_prior and
                                 self.K_steps > 1) else None)
        if live is not None:
            kl_l_k = jnp.where(live, kl_l_k, 0.0)
        losses["kl_l_k"] = kl_l_k
        comp_stats["pmu_k"] = p_mu
        comp_stats["psigma_k"] = p_sigma

        if self.debug:
            # Reference genesisv2_config.py:191-196: per-forward mask-sum
            # invariants under debug.
            from genesis_tpu.ops import debug_checks
            debug_checks.check_log_masks(log_m_k, "log_m_k")
            debug_checks.check_log_masks(log_m_r_k, "log_m_r_k")

        stats = AttrDict(
            recon=recon, log_m_k=log_m_k, log_s_k=log_s_k, x_r_k=x_r_k,
            log_m_r_k=log_m_r_k, mx_r_k=x_r_k * jnp.exp(log_m_r_k),
            instance_seg=jnp.argmax(log_m_k[..., 0], axis=0),
            instance_seg_r=jnp.argmax(log_m_r_k[..., 0], axis=0))
        return recon, losses, stats, AttrDict(att_stats), comp_stats

    def sample(self, batch_size: int, K_steps=None):
        K_steps = self.K_steps if K_steps is None else K_steps
        key = self.make_rng("sample")
        if self.autoreg_prior:
            z_k = self.prior.rollout(key, batch_size, K_steps)
        else:
            z_k = jax.random.normal(
                key, (K_steps, batch_size, self.feat_dim))
        recon, x_r_k, log_m_r_k = self.decode_latents(z_k, train=False)
        stats = AttrDict(x_k=x_r_k, log_m_k=log_m_r_k,
                         mx_k=x_r_k * jnp.exp(log_m_r_k))
        return recon, stats

    def get_features(self, x):
        _, _, _, _, comp_stats = self(x, train=False)
        return jnp.concatenate(list(comp_stats["z_k"]), axis=-1)
