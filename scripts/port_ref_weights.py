"""Port torch reference model weights into genesis_tpu flax params.

Maps the reference state_dicts (models/genesis_config.py:145-343,
models/genesisv2_config.py:49-256, models/monet_config.py:74-133) onto
the flax param trees of genesis_tpu.models.*, converting layouts:

  * Conv2d          OIHW            -> HWIO
  * ConvTranspose2d IOHW            -> HWIO spatially FLIPPED (flax
    ConvTranspose correlates, torch conv-transposes; alignment parity
    comes from B.ConvT's torch-style int padding)
  * Linear          (out, in)       -> (in, out)
  * Linear on flattened feature maps: additionally permute the flat
    axis from torch's (c, h, w) to NHWC's (h, w, c) ordering
  * GroupNorm/LayerNorm weight/bias -> scale/bias
  * torch LSTM packed (i, f, g, o) rows -> flax OptimizedLSTMCell's
    per-gate kernels (bias_ih + bias_hh fold into the h-side bias)

Usable for golden-parity tests against randomly-initialised reference
models (tests/test_ref_parity.py) and for porting a real published
reference checkpoint (model.ckpt `model_state_dict`) into this
framework for evaluation.
"""

import argparse

import numpy as np


# ---------------------------------------------------------------------------
# Layout converters
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, dtype=np.float32)


def conv_w(t):
    """Conv2d weight OIHW -> flax HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def convT_w(t):
    """ConvTranspose2d weight IOHW -> flax ConvTranspose HWIO, spatially
    flipped (flax computes a dilated correlation; torch computes the
    conv gradient). Verified numerically in tests/test_ref_parity.py."""
    return np.flip(_np(t).transpose(2, 3, 0, 1), axis=(0, 1)).copy()


def linear_w(t):
    """Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return _np(t).T.copy()


def linear_w_in_chw(t, c, h, w):
    """Linear over a torch-flattened (c,h,w) feature map -> Dense kernel
    over the NHWC-flattened (h,w,c) ordering."""
    W = _np(t)  # (out, c*h*w)
    out = W.shape[0]
    return W.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(
        h * w * c, out).copy()


def linear_w_out_chw(t, c, h, w):
    """Linear producing a torch (c,h,w)-flattened map -> Dense kernel
    producing the (h,w,c) ordering."""
    W = _np(t)  # (c*h*w, in)
    nin = W.shape[1]
    return W.reshape(c, h, w, nin).transpose(3, 1, 2, 0).reshape(
        nin, h * w * c).copy()


def bias_out_chw(t, c, h, w):
    return _np(t).reshape(c, h, w).transpose(1, 2, 0).reshape(-1).copy()


def lstm_cell(sd, prefix):
    """torch nn.LSTM layer-0 params -> flax OptimizedLSTMCell tree."""
    Wih = _np(sd[f"{prefix}.weight_ih_l0"])   # (4H, I), rows i,f,g,o
    Whh = _np(sd[f"{prefix}.weight_hh_l0"])   # (4H, H)
    b = _np(sd[f"{prefix}.bias_ih_l0"]) + _np(sd[f"{prefix}.bias_hh_l0"])
    H = Whh.shape[1]

    def chunk(M):
        return {g: M[i * H:(i + 1) * H] for i, g in enumerate("ifgo")}

    wi, wh, bg = chunk(Wih), chunk(Whh), chunk(b)
    cell = {}
    for g in "ifgo":
        cell["i" + g] = {"kernel": wi[g].T.copy()}
        cell["h" + g] = {"kernel": wh[g].T.copy(), "bias": bg[g].copy()}
    return cell


def _gn(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def _dense(sd, key):
    return {"kernel": linear_w(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def _conv(sd, key, bias=True):
    out = {"kernel": conv_w(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


# ---------------------------------------------------------------------------
# UNet (shared by GENESIS-V2 encoder and MONet attention)
# ---------------------------------------------------------------------------

def port_unet(sd, prefix, num_blocks, img_size, filter_start,
              final_conv=False, block="ConvGNReLU"):
    """Reference modules/unet.py:21-90 -> genesis_tpu.ops.unet.UNet.
    `block` is ConvGNReLU (norm='gn') or ConvINReLU (norm='in'); both
    lower the norm to a flax GroupNorm (instance norm = group_size 1)."""
    tree = {}
    for i in range(num_blocks):           # down path
        tree[f"{block}_{i}"] = {
            "Conv_0": _conv(sd, f"{prefix}down.{i}.0", bias=False),
            "GroupNorm_0": _gn(sd, f"{prefix}down.{i}.1")}
    for i in range(num_blocks):           # up path
        tree[f"{block}_{num_blocks + i}"] = {
            "Conv_0": _conv(sd, f"{prefix}up.{i}.0", bias=False),
            "GroupNorm_0": _gn(sd, f"{prefix}up.{i}.1")}
    fm = img_size // 2 ** (num_blocks - 1)
    cb = 2 * filter_start                 # bottleneck channels
    tree["Dense_0"] = {
        "kernel": linear_w_in_chw(sd[f"{prefix}mlp.1.weight"], cb, fm, fm),
        "bias": _np(sd[f"{prefix}mlp.1.bias"])}
    tree["Dense_1"] = _dense(sd, f"{prefix}mlp.3")
    tree["Dense_2"] = {
        "kernel": linear_w_out_chw(sd[f"{prefix}mlp.5.weight"], cb, fm, fm),
        "bias": bias_out_chw(sd[f"{prefix}mlp.5.bias"], cb, fm, fm)}
    if final_conv:
        tree["Conv_0"] = _conv(sd, f"{prefix}final_conv")
    return tree


# ---------------------------------------------------------------------------
# GENESIS-V2
# ---------------------------------------------------------------------------

def port_genesisv2(sd, img_size=64, feat_dim=64):
    """Reference GenesisV2 state_dict -> flax params tree
    (models/genesisv2_config.py:49-113 module layout)."""
    num_blocks = int(np.log2(img_size) - 1)
    params = {}
    params["encoder"] = port_unet(sd, "encoder.", num_blocks, img_size,
                                  min(feat_dim, 64))
    params["att_process"] = {
        "log_sigma": _np(sd["att_process.log_sigma"]),
        "colour_head": {
            "Conv_0": _conv(sd, "att_process.colour_head.conv"),
            "ScalarGate_0": {
                "gate": _np(sd["att_process.colour_head.gate.gate"])}}}
    params["seg_head"] = {
        "Conv_0": _conv(sd, "seg_head.0", bias=False),
        "GroupNorm_0": _gn(sd, "seg_head.1")}
    params["feat_head_conv"] = {
        "Conv_0": _conv(sd, "feat_head.0.0", bias=False),
        "GroupNorm_0": _gn(sd, "feat_head.0.1")}
    params["feat_head_out"] = _conv(sd, "feat_head.1")
    params["z_head"] = {
        "layers_0": _gn(sd, "z_head.0"),       # LayerNorm scale/bias
        "layers_1": _dense(sd, "z_head.1"),
        "layers_3": _dense(sd, "z_head.3")}
    # Decoder: BroadcastLayer at seq[0] has no params; deconvs at
    # 1,4,7,10; GroupNorms at 2,5,8,11; 1x1 head at 13.
    for j, idx in enumerate((1, 4, 7, 10)):
        params[f"dec_convs_{j}"] = {
            "kernel": convT_w(sd[f"decoder_module.{idx}.weight"]),
            "bias": _np(sd[f"decoder_module.{idx}.bias"])}
        params[f"dec_norms_{j}"] = _gn(sd, f"decoder_module.{idx + 1}")
    params["dec_head"] = _conv(sd, "decoder_module.13")
    if any(k.startswith("prior_lstm.") for k in sd):
        params["prior"] = {"cell": lstm_cell(sd, "prior_lstm"),
                           "linear": _dense(sd, "prior_linear")}
    return {"params": params}


# ---------------------------------------------------------------------------
# GENESIS (two-stage: sylvester gated-conv VAE attention + component VAE)
# ---------------------------------------------------------------------------

def port_gc_stack(sd, prefix, n, transpose):
    """A sylvester gated-conv stack (third_party/sylvester/layers.py:11-95)
    -> (params, batch_stats) subtrees of ops.gc_vae stacks."""
    tree_p, tree_s = {}, {}
    for i in range(n):
        base = f"{prefix}.{i}"
        name = f"GatedConv_{i}"
        if transpose:
            p = {"ConvTranspose_0": {
                "kernel": convT_w(sd[f"{base}.conv.weight"]),
                "bias": _np(sd[f"{base}.conv.bias"])}}
        else:
            p = {"Conv_0": {"kernel": conv_w(sd[f"{base}.conv.weight"]),
                            "bias": _np(sd[f"{base}.conv.bias"])}}
        s = {}
        for norm in ("h_norm", "g_norm"):
            if f"{base}.{norm}.weight" in sd:
                p[norm] = {"scale": _np(sd[f"{base}.{norm}.weight"]),
                           "bias": _np(sd[f"{base}.{norm}.bias"])}
            if f"{base}.{norm}.running_mean" in sd:
                s[norm] = {"mean": _np(sd[f"{base}.{norm}.running_mean"]),
                           "var": _np(sd[f"{base}.{norm}.running_var"])}
        tree_p[name] = p
        if s:
            tree_s[name] = s
    return tree_p, tree_s


def port_comp_vae(sd, img_size):
    """Reference modules/component_vae.py (MONet encoder + broadcast
    decoder) -> ops.component_vae.ComponentVAE params subtree."""
    fm = img_size // 16
    enc = {}
    for j, idx in enumerate((0, 2, 4, 6)):
        enc[f"Conv_{j}"] = _conv(sd, f"comp_vae.encoder_module."
                                     f"module.{idx}")
    c2 = sd["comp_vae.encoder_module.module.6.weight"].shape[0]
    enc["Dense_0"] = {
        "kernel": linear_w_in_chw(
            sd["comp_vae.encoder_module.module.9.weight"], c2, fm, fm),
        "bias": _np(sd["comp_vae.encoder_module.module.9.bias"])}
    enc["Dense_1"] = _dense(sd, "comp_vae.encoder_module.module.11")
    dec = {}
    for j, idx in enumerate((1, 3, 5, 7, 9)):
        dec[f"Conv_{j}"] = _conv(sd, f"comp_vae.decoder_module.seq.{idx}")
    return {"encoder_module": enc, "decoder_module": dec}


def port_monet(sd, img_size=64, filter_start=32):
    """Reference MONet state_dict -> flax params
    (models/monet_config.py:45-72 module layout)."""
    num_blocks = int(np.log2(img_size) - 1)
    core = port_unet(sd, "att_process.core.", num_blocks, img_size,
                     filter_start, block="ConvINReLU")
    core["Conv_0"] = _conv(sd, "att_process.core.final_conv")
    return {"params": {"att_process": {"core": core},
                       "comp_vae": port_comp_vae(sd, img_size)}}


def _count_layers(sd, prefix):
    return len({k[len(prefix) + 1:].split(".")[0] for k in sd
                if k.startswith(prefix + ".")})


def port_vae(sd):
    """Reference BaselineVAE state_dict -> flax params
    (models/vae_config.py:40-62: bare sylvester VAE, no norms)."""
    core = {}
    core["q_z_nn"], _ = port_gc_stack(
        sd, "vae.q_z_nn", _count_layers(sd, "vae.q_z_nn"),
        transpose=False)
    core["p_x_nn"], _ = port_gc_stack(
        sd, "vae.p_x_nn", _count_layers(sd, "vae.p_x_nn"),
        transpose=True)
    core["q_z_mean"] = _dense(sd, "vae.q_z_mean")
    core["q_z_var_head"] = _dense(sd, "vae.q_z_var.0")
    core["p_x_mean"] = _conv(sd, "vae.p_x_mean")
    return {"params": {"vae": core}}


def port_genesis(sd, img_size=64):
    """Reference Genesis state_dict -> flax (params, batch_stats)
    (models/genesis_config.py:57-139 module layout; two_stage +
    comp_prior default configuration)."""
    params, stats = {}, {}

    # --- attention core: sylvester VAE ---
    core_p, core_s = {}, {}
    n_q = len({k.split(".")[3] for k in sd
               if k.startswith("att_process.core.q_z_nn.")})
    n_p = len({k.split(".")[3] for k in sd
               if k.startswith("att_process.core.p_x_nn.")})
    core_p["q_z_nn"], qs = port_gc_stack(
        sd, "att_process.core.q_z_nn", n_q, transpose=False)
    core_p["p_x_nn"], ps = port_gc_stack(
        sd, "att_process.core.p_x_nn", n_p, transpose=True)
    if qs:
        core_s["q_z_nn"] = qs
    if ps:
        core_s["p_x_nn"] = ps
    core_p["q_z_mean"] = _dense(sd, "att_process.core.q_z_mean")
    core_p["q_z_var_head"] = _dense(sd, "att_process.core.q_z_var.0")
    core_p["p_x_mean"] = _conv(sd, "att_process.core.p_x_mean")
    params["att_process"] = {
        "core": core_p,
        "lstm": lstm_cell(sd, "att_process.lstm"),
        "linear": _dense(sd, "att_process.linear")}
    if core_s:
        stats["att_process"] = {"core": core_s}

    # --- component VAE ---
    if any(k.startswith("comp_vae.encoder_module.0.") for k in sd):
        # comp_symmetric=True: sylvester gated stacks replace the MONet
        # encoder / broadcast decoder (genesis_config.py:102-119).
        enc_p, enc_s = port_gc_stack(
            sd, "comp_vae.encoder_module.0",
            _count_layers(sd, "comp_vae.encoder_module.0"),
            transpose=False)
        dec_p, dec_s = port_gc_stack(
            sd, "comp_vae.decoder_module.1",
            _count_layers(sd, "comp_vae.decoder_module.1"),
            transpose=True)
        params["sym_encoder"] = {"GatedConvEncoder_0": enc_p}
        params["sym_decoder"] = {"GatedConvDecoder_0": dec_p,
                                 "Conv_0": _conv(sd,
                                                 "comp_vae."
                                                 "decoder_module.2")}
        if enc_s:
            stats["sym_encoder"] = {"GatedConvEncoder_0": enc_s}
        if dec_s:
            stats["sym_decoder"] = {"GatedConvDecoder_0": dec_s}
    elif any(k.startswith("comp_vae.") for k in sd):
        params["comp_vae"] = port_comp_vae(sd, img_size)

    # --- priors ---
    if any(k.startswith("prior_lstm.") for k in sd):
        params["prior"] = {"cell": lstm_cell(sd, "prior_lstm"),
                           "linear": _dense(sd, "prior_linear")}
    if any(k.startswith("prior_mlp.") for k in sd):
        params["prior_mlp"] = {
            f"layers_{i}": _dense(sd, f"prior_mlp.{i}")
            for i in (0, 2, 4)}
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# Verification against a flax template
# ---------------------------------------------------------------------------

def check_against_template(variables, template):
    """Raise if `variables` misses/adds/mis-shapes leaves vs `template`
    (same contract as scripts/port_fid_weights.py)."""
    import jax
    flat_t = {str(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(template)[0]}
    flat_v = {str(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(variables)[0]}
    missing = set(flat_t) - set(flat_v)
    extra = set(flat_v) - set(flat_t)
    if missing or extra:
        raise ValueError(f"tree mismatch: missing={sorted(missing)[:8]} "
                         f"extra={sorted(extra)[:8]}")
    for path, leaf in flat_t.items():
        if tuple(leaf.shape) != tuple(flat_v[path].shape):
            raise ValueError(
                f"{path}: expected {leaf.shape}, got {flat_v[path].shape}")


def main():
    ap = argparse.ArgumentParser(
        description="Port a reference torch checkpoint (model.ckpt) "
                    "into a genesis_tpu msgpack checkpoint.")
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--model", default="genesisv2",
                    choices=["genesisv2", "genesis", "monet"])
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--feat_dim", type=int, default=64)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    from flax import serialization

    ckpt = torch.load(args.torch_ckpt, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    if args.model == "genesisv2":
        variables = port_genesisv2(sd, args.img_size, args.feat_dim)
    elif args.model == "genesis":
        variables = port_genesis(sd, args.img_size)
    else:
        variables = port_monet(sd, args.img_size)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
