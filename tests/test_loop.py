"""Loop-level trainer contracts: resume continuity and divergence exit.

Reference behaviour being matched:
  * train.py:179-207 — `--resume` restores model/optimiser/GECO state and
    the iteration counter from model.ckpt-latest and continues.
  * train.py:42,364-368 — ELBO > ELBO_DIV saves a diverged checkpoint and
    aborts with a nonzero exit.
Drives genesis_tpu.train.loop.train() end-to-end on the synthetic data
config with the baseline VAE (smallest compile).
"""

import json
import os.path as osp

import jax
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.train import checkpoint as ckpt_lib
from genesis_tpu.train import loop as loop_lib


def loop_cfg(tmp_path, **over):
    cfg = AttrDict(
        data_config="genesis_tpu/data/synthetic_config.py",
        model_config="genesis_tpu/models/vae_config.py",
        results_dir=str(tmp_path), run_name="looptest",
        report_loss_every=2, run_validation_every=100000,
        log_images_every=100000, num_checkpoints=2, resume=False,
        train_iter=4, batch_size=8, optimiser="adam", learning_rate=1e-4,
        N_eval=8, num_fid_images=8, beta=0.5, beta_warmup=False,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, model_parallel=1, debug=False,
        seed=0,
        # synthetic data + tiny VAE (matches cached test shapes)
        img_size=32, K_steps=3, load_instances=True, num_workers=0,
        synth_train_size=16, synth_eval_size=8, synth_max_sprites=4,
        pixel_bound=True, pixel_std=0.7, latent_dimension=16,
        filter_start=8, broadcast_decoder=False,
    )
    cfg.update(over)
    return cfg


def _scalars(run_dir, tag="train"):
    rows = []
    with open(osp.join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if row.get("tag") == tag:
                rows.append(row)
    return rows


def test_resume_continuity(tmp_path):
    cfg = loop_cfg(tmp_path)
    state1 = loop_lib.train(cfg)
    run_dir = osp.join(str(tmp_path), "looptest", "1")
    assert osp.exists(osp.join(run_dir, "model.ckpt-latest"))
    assert osp.exists(osp.join(run_dir, "model.ckpt-FINAL"))
    assert osp.exists(osp.join(run_dir, "flags.json"))
    step1 = int(state1.step)
    beta1 = float(np.asarray(state1.geco["beta"]))
    ema1 = float(np.asarray(state1.geco["err_ema"]))
    rows1 = _scalars(run_dir)
    assert rows1, "heartbeat scalars must be logged"

    # Restart with --resume and a longer horizon: the run dir is reused,
    # the step counter continues from the latest checkpoint, and GECO
    # state carries over (not re-initialised to g_init=1.0).
    cfg2 = loop_cfg(tmp_path, resume=True, train_iter=8)
    state2 = loop_lib.train(cfg2)
    assert int(state2.step) > step1
    rows2 = _scalars(run_dir)
    new_rows = rows2[len(rows1):]
    assert new_rows, "resumed run must log new heartbeats"
    # All post-resume steps continue past the first run's counter.
    assert min(r["step"] for r in new_rows) > step1
    # GECO beta moves only by the per-step multiplicative update
    # (~0.7%/step here), so the first resumed heartbeat (2-3 steps past
    # the restored ckpt) must be within a few % of run 1's final beta —
    # not back at g_init=1.0 (which a state re-init would produce).
    beta_resumed = new_rows[0]["geco_beta"]
    assert abs(beta_resumed - beta1) / beta1 < 0.05
    assert abs(beta_resumed - 1.0) > 1e-6 or beta1 != 1.0
    # err EMA continuity: same order of magnitude as run 1's final EMA.
    ema_resumed = new_rows[0]["geco_err_ema"]
    assert 0.5 * ema1 < ema_resumed < 2.0 * ema1


def test_resume_missing_logdir_warns_and_trains_fresh(tmp_path):
    cfg = loop_cfg(tmp_path, resume=True, run_name="neverexisted",
                   train_iter=2)
    state = loop_lib.train(cfg)  # reference train.py:118-121 downgrade
    assert int(state.step) >= 2


def test_divergence_exit(tmp_path, monkeypatch):
    """Force the divergence guard: any finite ELBO exceeds the patched
    threshold at the first heartbeat -> diverged ckpt + SystemExit(1)."""
    monkeypatch.setattr(loop_lib, "ELBO_DIV", -1.0)
    cfg = loop_cfg(tmp_path, run_name="divtest")
    with pytest.raises(SystemExit) as exc:
        loop_lib.train(cfg)
    assert exc.value.code == 1
    run_dir = osp.join(str(tmp_path), "divtest", "1")
    diverged = osp.join(run_dir, "model.ckpt-diverged")
    assert osp.exists(diverged)
    # The diverged checkpoint restores cleanly.
    from genesis_tpu.core import experiment as fet
    from genesis_tpu.train.state import create_train_state
    model = fet.load(cfg.model_config, cfg)
    from genesis_tpu.data import synthetic
    batch = synthetic.generate_dataset(4, cfg.img_size, seed=0)
    template = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore_checkpoint(diverged, template)
    assert int(restored.step) >= 1


def test_device_dataset_mode(tmp_path):
    """--device_dataset stages the train split on device and trains by
    on-device index gather; losses must stay finite, checkpoints/scalars
    must be produced, and the run must complete the same step count as
    the streaming path."""
    cfg = loop_cfg(tmp_path, run_name="devdata", device_dataset=True,
                   train_iter=6)
    state = loop_lib.train(cfg)
    assert int(state.step) >= 6
    run_dir = osp.join(str(tmp_path), "devdata", "1")
    rows = _scalars(run_dir)
    assert rows, "no train scalars logged"
    assert all(np.isfinite(r["elbo"]) for r in rows)
    assert osp.exists(osp.join(run_dir, "model.ckpt-latest"))


def test_device_dataset_fallback_on_oversized_split(tmp_path, monkeypatch):
    """Splits beyond the HBM budget fall back to the streaming loader."""
    from genesis_tpu.data import loader as loader_lib
    monkeypatch.setattr(
        loader_lib, "materialize_inputs", lambda l, **k: None)
    cfg = loop_cfg(tmp_path, run_name="devdata_fb", device_dataset=True,
                   train_iter=2)
    state = loop_lib.train(cfg)
    assert int(state.step) >= 2


def test_grad_and_weight_histograms(tmp_path, monkeypatch):
    """--log_grads_and_weights logs BOTH weights/* and grads/* histograms
    on the validation cadence (reference train.py:339-345 logs
    param.data and param.grad for every parameter)."""
    from genesis_tpu.utils import logging as log_lib
    seen = []
    monkeypatch.setattr(
        log_lib.MetricsLogger, "log_histogram",
        lambda self, name, values, step: seen.append(name))
    cfg = loop_cfg(tmp_path, run_name="gradhist", run_validation_every=2,
                   log_grads_and_weights=True)
    loop_lib.train(cfg)
    weights = {n[len("weights/"):] for n in seen
               if n.startswith("weights/")}
    grads = {n[len("grads/"):] for n in seen if n.startswith("grads/")}
    assert weights, "no weight histograms logged"
    assert weights == grads, "every weight needs a matching grad histogram"
