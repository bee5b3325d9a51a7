#!/usr/bin/env python
"""Port a COMPLETE reference run directory into a genesis_tpu run dir.

Takes a real reference training run (the directory reference train.py
writes: flags.json + model.ckpt-<n>, reference train.py:410-420) and
produces a run dir this framework's eval CLIs (compute_seg_metrics,
visualise_*, compute_fid) restore directly:

  <out>/flags.json        reference flags with the config paths
                          translated to this repo's config modules
  <out>/model.ckpt-PORTED TrainState msgpack with the ported params
                          (+BatchNorm stats), step, and GECO beta /
                          err_ema carried over; optimiser state fresh.

This is the end-to-end exercise of the weight-port path on a real
trained artifact (VERDICT r4 #8): train the torch reference, port the
checkpoint, and evaluate it with BOTH frameworks' own eval CLIs on the
same data.

Usage:
  python scripts/port_ref_run.py \
      --ref_run_dir /tmp/ref_baseline/ref_baseline/1 \
      --model_file model.ckpt-latest --out /tmp/ported_run
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

CONFIG_MAP = {
    "datasets/multid_config.py": "genesis_tpu/data/multid_config.py",
    "datasets/gqn_config.py": "genesis_tpu/data/gqn_config.py",
    "datasets/shapestacks_config.py":
        "genesis_tpu/data/shapestacks_config.py",
    "datasets/multi_object_config.py":
        "genesis_tpu/data/multi_object_config.py",
    "datasets/sketchy_config.py": "genesis_tpu/data/sketchy_config.py",
    "datasets/apc_config.py": "genesis_tpu/data/apc_config.py",
    "models/genesisv2_config.py":
        "genesis_tpu/models/genesisv2_config.py",
    "models/genesis_config.py": "genesis_tpu/models/genesis_config.py",
    "models/monet_config.py": "genesis_tpu/models/monet_config.py",
    "models/vae_config.py": "genesis_tpu/models/vae_config.py",
}


def port_run(ref_run_dir: str, model_file: str, out_dir: str) -> str:
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.train import checkpoint as ckpt_lib
    from genesis_tpu.train.state import create_train_state
    from scripts import port_ref_weights as P

    flags = json.load(open(osp.join(ref_run_dir, "flags.json")))
    model_cfg = flags.get("model_config", "")
    for ref_path, ours in CONFIG_MAP.items():
        if flags.get("data_config") == ref_path:
            flags["data_config"] = ours
        if flags.get("model_config") == ref_path:
            flags["model_config"] = ours

    ckpt = torch.load(osp.join(ref_run_dir, model_file),
                      map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    img, feat = flags.get("img_size", 64), flags.get("feat_dim", 64)
    if "genesisv2" in model_cfg:
        variables = P.port_genesisv2(sd, img, feat)
    elif "genesis" in model_cfg:
        variables = P.port_genesis(sd, img)
    elif "monet" in model_cfg:
        variables = P.port_monet(sd, img)
    elif "vae" in model_cfg:
        variables = P.port_vae(sd)
    else:
        raise ValueError(f"unknown model_config {model_cfg!r}")

    cfg = AttrDict(flags)
    from genesis_tpu.core import experiment as fet
    model = fet.load(cfg.model_config, cfg)
    example = {"input": np.zeros((2, img, img, 3), np.float32)}
    state = create_train_state(model, cfg, example, jax.random.PRNGKey(0))
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
        step=jnp.asarray(int(ckpt.get("iter_idx", 0)), jnp.int32))
    if state.geco is not None and "beta" in ckpt:
        geco = dict(state.geco)
        geco["beta"] = jnp.asarray(float(ckpt["beta"]), jnp.float32)
        if ckpt.get("err_ema") is not None:
            geco["err_ema"] = jnp.asarray(
                float(ckpt["err_ema"]), jnp.float32)
            geco["ema_initialised"] = jnp.asarray(True)
        state = state.replace(geco=geco)

    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, "flags.json"), "w") as f:
        json.dump(flags, f, indent=2)
    out_path = osp.join(out_dir, "model.ckpt-PORTED")
    ckpt_lib.save_checkpoint(out_path, state)
    print(f"Ported {ref_run_dir}/{model_file} (iter "
          f"{int(ckpt.get('iter_idx', 0))}) -> {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_run_dir", required=True)
    ap.add_argument("--model_file", default="model.ckpt-latest")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    from genesis_tpu.core.jax_setup import setup_jax
    setup_jax()
    port_run(args.ref_run_dir, args.model_file, args.out)


if __name__ == "__main__":
    main()
