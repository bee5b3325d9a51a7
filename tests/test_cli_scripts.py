"""End-to-end smoke tests for the post-hoc CLIs (visualise_*,
compute_seg_metrics, compute_fid) against a freshly trained checkpoint —
the reference exercises these only by hand (scripts/*.py restore a run
dir via its flags.json, reference compute_fid.py:80-83).

One tiny GENESIS-V2 debug run on synthetic data feeds all CLIs. Each CLI
runs in-process through its main() with argv patched (same flag-parsing
path as the console), keeping the XLA compile cache shared.
"""

import glob
import json
import os.path as osp
import sys

import numpy as np
import pytest

from genesis_tpu.core import flags
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.train import loop as loop_lib

DATA_CFG = "genesis_tpu/data/synthetic_config.py"
MODEL_CFG = "genesis_tpu/models/genesisv2_config.py"


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Train tiny GENESIS-V2 for 4 steps; return its run dir."""
    tmp = tmp_path_factory.mktemp("clirun")
    cfg = AttrDict(
        data_config=DATA_CFG, model_config=MODEL_CFG,
        results_dir=str(tmp), run_name="cli",
        report_loss_every=2, run_validation_every=100000,
        log_images_every=100000, num_checkpoints=2, resume=False,
        train_iter=4, batch_size=8, optimiser="adam", learning_rate=1e-4,
        N_eval=8, num_fid_images=4, beta=0.5, beta_warmup=False,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, model_parallel=1, debug=False,
        seed=0,
        # tiny shapes matching tests/test_train.py::tiny_cfg for cache
        img_size=32, K_steps=3, feat_dim=32, comp_ldim=8,
        comp_enc_channels=8, comp_dec_channels=8, comp_dec_layers=2,
        pixel_bound=True, pixel_std1=0.7, pixel_std2=0.7,
        montecarlo_kl=True, load_instances=True, num_workers=0,
        synth_train_size=16, synth_eval_size=8, synth_max_sprites=4,
    )
    loop_lib.train(cfg)
    run_dir = osp.join(str(tmp), "cli", "1")
    assert osp.exists(osp.join(run_dir, "model.ckpt-FINAL"))
    assert osp.exists(osp.join(run_dir, "flags.json"))
    return run_dir


def _run_cli(monkeypatch, module_name, argv):
    """Run a scripts/ CLI main() under argv, the same
    main_flags()+main() path as `python scripts/<name>.py`."""
    import importlib

    from genesis_tpu.core import experiment as fet
    monkeypatch.setattr(sys, "argv", argv)
    flags.reset()
    fet.reset_module_cache()  # config modules must re-register flags
    mod = importlib.import_module(module_name)
    try:
        mod.main_flags()
        mod.main()
    finally:
        flags.reset()
        fet.reset_module_cache()


def test_visualise_reconstruction(trained_run, monkeypatch, tmp_path):
    out = str(tmp_path / "recon")
    _run_cli(monkeypatch, "scripts.visualise_reconstruction", [
        "visualise_reconstruction.py",
        "--data_config", DATA_CFG, "--model_config", MODEL_CFG,
        "--model_dir", trained_run, "--out_dir", out,
        "--batch_size", "2"])
    pngs = glob.glob(osp.join(out, "*.png"))
    assert pngs, "reconstruction figures must be written"


def test_visualise_generation(trained_run, monkeypatch, tmp_path):
    out = str(tmp_path / "gen")
    _run_cli(monkeypatch, "scripts.visualise_generation", [
        "visualise_generation.py",
        "--data_config", DATA_CFG, "--model_config", MODEL_CFG,
        "--model_dir", trained_run, "--out_dir", out,
        "--batch_size", "2"])
    pngs = glob.glob(osp.join(out, "*.png"))
    assert pngs, "generation figures must be written"


def test_visualise_data(monkeypatch, tmp_path):
    out = str(tmp_path / "data")
    _run_cli(monkeypatch, "scripts.visualise_data", [
        "visualise_data.py", "--data_config", DATA_CFG,
        "--out_dir", out, "--batch_size", "2", "--img_size", "32",
        "--synth_train_size", "8", "--synth_eval_size", "4"])
    pngs = glob.glob(osp.join(out, "*.png"))
    assert pngs, "data figures must be written"


def test_compute_seg_metrics_cli(trained_run, monkeypatch, capsys):
    _run_cli(monkeypatch, "scripts.compute_seg_metrics", [
        "compute_seg_metrics.py",
        "--data_config", DATA_CFG, "--model_config", MODEL_CFG,
        "--model_dir", trained_run, "--split", "test",
        "--batch_size", "1", "--num_images", "4"])
    out = capsys.readouterr().out
    assert "ari" in out.lower()
    # fprint tee lands in the run dir as well
    logs = glob.glob(osp.join(trained_run, "*.txt"))
    assert logs


def test_seg_metrics_cli_reports_mean_msc_variant(trained_run, monkeypatch,
                                                  capsys):
    """The CLI must report the MEAN covering (first return of
    segmentation_covering), matching reference compute_seg_metrics.py:117
    + utils/misc.py:224-235 — not the area-scaled second return."""
    import jax.numpy as jnp

    from genesis_tpu.eval import metrics as M
    real = M.segmentation_covering

    def marked(gt, pred, num_pred, **kw):
        mean_sc, scaled_sc = real(gt, pred, num_pred, **kw)
        return (jnp.full_like(mean_sc, 0.25),
                jnp.full_like(scaled_sc, 0.75))

    monkeypatch.setattr(M, "segmentation_covering", marked)
    _run_cli(monkeypatch, "scripts.compute_seg_metrics", [
        "compute_seg_metrics.py",
        "--data_config", DATA_CFG, "--model_config", MODEL_CFG,
        "--model_dir", trained_run, "--split", "test",
        "--batch_size", "2", "--num_images", "4"])
    out = capsys.readouterr().out
    msc_lines = [ln for ln in out.splitlines() if "msc" in ln]
    assert msc_lines, out
    assert all("0.2500" in ln for ln in msc_lines), \
        f"scaled variant leaked into the CLI output: {msc_lines}"


def test_compute_fid_cli(trained_run, monkeypatch, tmp_path, capsys):
    _run_cli(monkeypatch, "scripts.compute_fid", [
        "compute_fid.py",
        "--data_config", DATA_CFG, "--model_config", MODEL_CFG,
        "--model_dir", trained_run, "--num_fid_images", "4",
        "--batch_size", "2",
        "--img_dir", str(tmp_path / "fid_imgs"), "--feat_dim", "64"])
    # PNG parity dumps land next to the streamed features.
    assert glob.glob(osp.join(str(tmp_path / "fid_imgs"), "*", "*.png"))
    out = capsys.readouterr().out
    assert "fid" in out.lower()


def test_cli_restores_configs_from_flags_json(trained_run, monkeypatch,
                                              tmp_path, tmp_path_factory):
    """`--model_dir` alone must restore the run's own model/data configs
    from flags.json (config round-tripping): a GENESIS checkpoint is
    visualised without passing --model_config, even though the CLI
    default is genesisv2_config."""
    tmp = tmp_path_factory.mktemp("clirun_genesis")
    cfg = AttrDict(
        data_config=DATA_CFG,
        model_config="genesis_tpu/models/genesis_config.py",
        results_dir=str(tmp), run_name="cli_g",
        report_loss_every=2, run_validation_every=100000,
        log_images_every=100000, num_checkpoints=2, resume=False,
        train_iter=2, batch_size=4, optimiser="adam", learning_rate=1e-4,
        N_eval=4, num_fid_images=4, beta=0.5, beta_warmup=False,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, model_parallel=1, debug=False,
        seed=0, img_size=32, K_steps=3, feat_dim=32, comp_ldim=8,
        comp_enc_channels=8, comp_dec_channels=8, comp_dec_layers=2,
        latent_dimension=16, attention_latents=16,
        two_stage=True, autoreg_prior=True, comp_prior=True,
        enc_norm="bn", dec_norm="bn", comp_symmetric=False,
        pixel_bound=True, pixel_std1=0.7, pixel_std2=0.7,
        montecarlo_kl=True, load_instances=True, num_workers=0,
        synth_train_size=8, synth_eval_size=4, synth_max_sprites=4,
    )
    loop_lib.train(cfg)
    run_dir = osp.join(str(tmp), "cli_g", "1")
    out = str(tmp_path / "gen_from_json")
    # No --model_config / --data_config on the command line.
    _run_cli(monkeypatch, "scripts.visualise_generation", [
        "visualise_generation.py",
        "--model_dir", run_dir, "--out_dir", out, "--batch_size", "2"])
    pngs = glob.glob(osp.join(out, "*.png"))
    assert pngs, "GENESIS run must restore through flags.json configs"
