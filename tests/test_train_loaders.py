"""End-to-end training through every exotic data loader.

The reference wires each dataset config into the same train.py
(reference train.py:45-50 + datasets/*.py) but only the multi-object and
multid paths get exercised routinely; GQN / ShapeStacks / Sketchy / APC
reach training only when the real datasets are mounted.  These tests
drive genesis_tpu.train.loop.train() END-TO-END (train steps, validation,
final eval, FID stage) over tiny on-disk fixtures that mirror each
dataset's real layout, proving every loader feeds the trainer — not just
its own unit test.

Reference layout contracts per loader:
  * GQN          — datasets/gqn_config.py + tf_gqn provider
  * ShapeStacks  — datasets/shapestacks_config.py (+ iseg .map labels)
  * Sketchy      — datasets/sketchy_config.py (processed episode PNGs)
  * APC          — datasets/apc_config.py (scene dirs + optional masks)
"""

import os.path as osp

import pytest

import test_datasets as fixtures
from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.train import loop as loop_lib

VAE_CFG = "genesis_tpu/models/vae_config.py"
V2_CFG = "genesis_tpu/models/genesisv2_config.py"


def _train_cfg(tmp_path, data_config, model_config, **over):
    """Trainer cfg skeleton; debug=True gives the reference's debug
    protocol (10 steps, batch 2, validation at 5, 10-image FID)."""
    cfg = AttrDict(
        data_config=data_config, model_config=model_config,
        results_dir=str(tmp_path), run_name="loadertest",
        report_loss_every=5, run_validation_every=100000,
        log_images_every=100000, num_checkpoints=1, resume=False,
        train_iter=10, batch_size=2, optimiser="adam", learning_rate=1e-4,
        N_eval=4, num_fid_images=4, beta=0.5, beta_warmup=False,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, model_parallel=1, debug=True,
        seed=0, num_workers=0, load_instances=True,
        # baseline VAE (smallest model); V2 tests override
        latent_dimension=16, broadcast_decoder=False, num_flows=0,
        pixel_bound=True, pixel_std=0.7, compute_dtype="float32",
    )
    cfg.update(over)
    return cfg


def _assert_trained(tmp_path, state):
    run_dir = osp.join(str(tmp_path), "loadertest", "1")
    assert int(state.step) >= 10  # debug protocol trains 10 steps
    assert osp.exists(osp.join(run_dir, "model.ckpt-FINAL"))
    assert osp.exists(osp.join(run_dir, "scalars.jsonl"))
    return run_dir


def test_train_through_gqn_loader(tmp_path, monkeypatch):
    """GQN devel_train/devel_val file-split feeding the trainer.

    The registry's debug stub has a single train file, which the devel
    split (gqn_tfr_provider.py:109-137 law) slices to zero files, so the
    fixture registers a 2-file variant and builds both files on disk.
    The registry patch must target the CONFIG-MODULE copy the trainer
    execs (core/experiment.py import_config_module cache), not the
    `genesis_tpu.data.gqn_config` import."""
    from genesis_tpu.core import experiment as fet
    gqn = fet.import_config_module("genesis_tpu/data/gqn_config.py")
    monkeypatch.setitem(
        gqn.DATASETS, "rooms_ring_camera_debug",
        gqn.DatasetInfo("rooms_ring_camera_debug", 2, 1, 64, 4))
    root = fixtures._gqn_fixture(
        tmp_path, num_train_files=2, num_test_files=1,
        records_per_file=12, seq=4)
    cfg = _train_cfg(
        tmp_path, "genesis_tpu/data/gqn_config.py", VAE_CFG,
        data_folder=root, gqn_dataset="rooms_ring_camera_debug",
        img_size=64, val_frac=2, buffer_size=2)
    state = loop_lib.train(cfg)
    _assert_trained(tmp_path, state)


def test_train_through_shapestacks_loader(tmp_path):
    """ShapeStacks split txts + iseg labels through tiny GENESIS-V2 so
    the instances path (ARI/MSC eval) is live, not just the images."""
    import json
    root = fixtures._shapestacks_fixture(tmp_path, n_scenarios=4,
                                         imgs_per=2)
    cfg = _train_cfg(
        tmp_path, "genesis_tpu/data/shapestacks_config.py", V2_CFG,
        data_folder=root, split_name="default", img_size=32,
        shuffle_test=False, copy_to_tmp=False,
        # tiny V2 matching tests/test_train.py::tiny_cfg cache shapes
        K_steps=3, feat_dim=32, comp_ldim=8, comp_enc_channels=8,
        comp_dec_channels=8, comp_dec_layers=2, pixel_std1=0.7,
        pixel_std2=0.7, montecarlo_kl=True)
    state = loop_lib.train(cfg)
    run_dir = _assert_trained(tmp_path, state)
    # Validation actually computed seg metrics from the iseg labels.
    seg_rows = [json.loads(line)
                for line in open(osp.join(run_dir, "scalars.jsonl"))
                if '"val"' in line]
    assert any("ari_fg" in row for row in seg_rows)


def test_train_through_sketchy_loader(tmp_path):
    """Sketchy processed-episode layout (128px, no instances)."""
    rs = fixtures.np.random.RandomState(0)
    root = tmp_path / "sketchy"
    for mode in ("train", "valid", "test"):
        d = root / "processed" / mode / "ep000000"
        d.mkdir(parents=True)
        for i in range(6):
            fixtures.Image.fromarray(
                rs.randint(0, 255, (128, 128, 3), fixtures.np.uint8)).save(
                d / f"ep000000_t{i:03d}_fl_full.png")
    cfg = _train_cfg(
        tmp_path, "genesis_tpu/data/sketchy_config.py", VAE_CFG,
        data_folder=str(root), img_size=128)
    state = loop_lib.train(cfg)
    _assert_trained(tmp_path, state)


def test_train_through_apc_loader(tmp_path):
    """APC scene-split layout with per-scene mask fallback (128px)."""
    rs = fixtures.np.random.RandomState(0)
    root = tmp_path / "apc"
    for scene in range(12):
        d = root / "processed" / "obj" / "env" / f"scene-{scene:04d}"
        (d / "masks").mkdir(parents=True)
        for i in range(2):
            fixtures.Image.fromarray(
                rs.randint(0, 255, (128, 128, 3), fixtures.np.uint8)).save(
                d / f"frame-{i:06d}.color.png")
            if scene % 2 == 0:
                fixtures.Image.fromarray(
                    rs.randint(0, 5, (128, 128), fixtures.np.uint8)).save(
                    d / "masks" / f"frame-{i:06d}.mask.png")
    cfg = _train_cfg(
        tmp_path, "genesis_tpu/data/apc_config.py", VAE_CFG,
        data_folder=str(root), img_size=128)
    state = loop_lib.train(cfg)
    _assert_trained(tmp_path, state)
