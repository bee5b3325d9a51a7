"""Dataset config tests over tiny synthetic fixtures that mirror each
dataset's on-disk layout."""

import io
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.data import multi_object_datasets as mods
from genesis_tpu.data import tfrecord as tfr

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


# --- GQN ----------------------------------------------------------------

def _gqn_fixture(tmp_path, num_train_files=1, num_test_files=1,
                 records_per_file=24, seq=10):
    # rooms_ring_camera_debug registry entry: 1 train file, 1 test file
    rs = np.random.RandomState(0)
    root = tmp_path / "gqn"
    for folder, n in (("train", num_train_files), ("test", num_test_files)):
        base = root / "rooms_ring_camera_debug" / folder
        base.mkdir(parents=True)
        length = len(str(n))
        template = "{:0%d}-of-{:0%d}.tfrecord" % (length, length)
        for fi in range(n):
            recs = []
            for _ in range(records_per_file):
                jpegs = []
                for _ in range(seq):
                    img = Image.fromarray(
                        rs.randint(0, 255, (64, 64, 3), np.uint8))
                    buf = io.BytesIO()
                    img.save(buf, format="JPEG")
                    jpegs.append(buf.getvalue())
                # frames: sequence of bytes; cameras: seq*5 floats
                ex = _multi_bytes_example(jpegs, rs.rand(seq * 5))
                recs.append(ex)
            tfr.write_records(str(base / template.format(fi + 1, n)), recs)
    return str(root)


def _multi_bytes_example(byte_list, floats):
    """Example with a repeated-bytes feature (frames) + float feature."""
    frames_payload = b"".join(
        tfr._len_delim(1, b) for b in byte_list)
    frames_feature = tfr._len_delim(1, frames_payload)  # BytesList
    arr = np.asarray(floats, "<f4")
    cams_feature = tfr._len_delim(2, tfr._len_delim(1, arr.tobytes()))
    entries = b""
    entries += tfr._len_delim(1, tfr._len_delim(1, b"frames")
                              + tfr._len_delim(2, frames_feature))
    entries += tfr._len_delim(1, tfr._len_delim(1, b"cameras")
                              + tfr._len_delim(2, cams_feature))
    return tfr._len_delim(1, entries)


def test_gqn_loader(tmp_path):
    from genesis_tpu.data import gqn_config as gqn
    root = _gqn_fixture(tmp_path)
    loader = gqn.GQNLoader(
        data_folder=root, dataset="rooms_ring_camera_debug",
        mode="train", img_size=64, val_frac=2, batch_size=4,
        buffer_size=2, seed=0, num_frames=24)
    batches = list(loader)
    assert len(batches) == 6
    b = batches[0]
    assert b["input"].shape == (4, 64, 64, 3)
    assert b["input"].dtype == np.uint8  # normalised on device
    # devel split slices the train file list
    files_train = gqn.get_dataset_files(
        gqn.DATASETS["rooms_ring_camera"], "devel_train", 60, root)
    files_val = gqn.get_dataset_files(
        gqn.DATASETS["rooms_ring_camera"], "devel_val", 60, root)
    assert len(files_train) == (2160 // 60) * 59
    assert len(files_val) == 2160 - len(files_train)
    assert not set(files_train) & set(files_val)
    # all_frames (device-dataset staging) yields every view: seq x the
    # per-record count, so 24 records x 10 views / batch 4 = 60 batches.
    loader_all = gqn.GQNLoader(
        data_folder=root, dataset="rooms_ring_camera_debug",
        mode="train", img_size=64, val_frac=2, batch_size=4,
        buffer_size=2, seed=0, num_frames=240, all_frames=True)
    batches_all = list(loader_all)
    assert len(batches_all) == 60
    assert batches_all[0]["input"].shape == (4, 64, 64, 3)


# --- ShapeStacks ---------------------------------------------------------

def _shapestacks_fixture(tmp_path, n_scenarios=3, imgs_per=2):
    rs = np.random.RandomState(0)
    root = tmp_path / "shapestacks"
    (root / "splits" / "default").mkdir(parents=True)
    scenarios = []
    for i in range(n_scenarios):
        name = f"env_ccs-hard-h=2-vcom={i % 2}-vpsf=0-v=6{i}"
        scenarios.append(name)
        rec = root / "recordings" / name
        rec.mkdir(parents=True)
        iseg = root / "iseg" / name
        iseg.mkdir(parents=True)
        for j in range(imgs_per):
            img = Image.fromarray(
                rs.randint(0, 255, (224, 224, 3), np.uint8))
            img.save(rec / f"rgb-w=5-f=2-l=1-c=unique-cam_{j}-mono-0.png")
            # iseg map: labels 0..4 encoded * 32 in channel 0
            labels = rs.randint(0, 5, (224, 224), np.uint8) * 32
            Image.fromarray(labels).save(
                iseg / f"iseg-w=0-f=0-l=0-c=original-cam_{j}-mono-0.map",
                format="PNG")
    for mode, sel in (("train", scenarios[:2]), ("eval", scenarios[2:]),
                      ("test", scenarios[2:])):
        with open(root / "splits" / "default" / f"{mode}.txt", "w") as f:
            f.write("\n".join(sel) + "\n")
    return str(root)


def test_shapestacks_loader(tmp_path):
    from genesis_tpu.data import shapestacks_config as ss
    root = _shapestacks_fixture(tmp_path)
    cfg = AttrDict(data_folder=root, split_name="default", img_size=64,
                   shuffle_test=False, num_workers=0, load_instances=True,
                   copy_to_tmp=False, K_steps=9, batch_size=2, debug=True,
                   seed=0)
    tng, val, tst = ss.load(cfg)
    batch = next(iter(tng))
    assert batch["input"].shape == (2, 64, 64, 3)
    assert batch["input"].dtype == np.uint8
    assert batch["instances"].shape == (2, 64, 64, 1)
    labels = np.unique(batch["instances"])
    assert labels.min() >= 0 and labels.max() <= 4
    # Stability labels derived from scenario names
    ds = tng.dataset
    assert set(ds.stability_labels) <= {0.0, 1.0}


def test_shapestacks_cache_serves_identical_batches(tmp_path):
    """cache_images=True must decode once and then serve byte-identical
    data from RAM (no re-decode: PIL.Image.open is counted)."""
    from genesis_tpu.data import shapestacks_config as ss
    import PIL.Image
    root = _shapestacks_fixture(tmp_path)
    ds = ss.ShapeStacksDataset(root, "default", "train", 64,
                               load_instances=True, cache=True)
    idx = np.arange(2)
    first = ds.get_batch(idx)
    n_open = [0]
    real_open = PIL.Image.open

    def counting_open(*a, **k):
        n_open[0] += 1
        return real_open(*a, **k)

    PIL.Image.open = counting_open
    try:
        second = ds.get_batch(idx)
    finally:
        PIL.Image.open = real_open
    assert n_open[0] == 0
    np.testing.assert_array_equal(first["input"], second["input"])
    np.testing.assert_array_equal(first["instances"],
                                  second["instances"])


def test_generate_shapestacks_feeds_loader(tmp_path):
    """The at-scale synthetic generator writes the exact layout the
    loader consumes; blocks carry non-background labels."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_ss", osp.join(osp.dirname(osp.dirname(__file__)),
                           "scripts", "generate_shapestacks.py"))
    gen = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen)
    out = str(tmp_path / "ss-synth")
    import sys
    argv = sys.argv
    sys.argv = ["x", "--out", out, "--train", "2", "--eval", "1",
                "--test", "1", "--cams", "2"]
    try:
        gen.main()
    finally:
        sys.argv = argv
    from genesis_tpu.data import shapestacks_config as ss
    cfg = AttrDict(data_folder=out, split_name="default", img_size=64,
                   shuffle_test=False, num_workers=0, load_instances=True,
                   copy_to_tmp=False, K_steps=9, batch_size=4, debug=True,
                   seed=0, cache_images=True)
    tng, _, _ = ss.load(cfg)
    batch = next(iter(tng))
    assert batch["input"].shape == (4, 64, 64, 3)
    inst = batch["instances"]
    assert inst.max() >= 1 and inst.max() <= gen.MAX_H
    # Foreground exists but does not swamp the frame.
    fg = (inst > 0).mean()
    assert 0.01 < fg < 0.6


# --- Sketchy / APC -------------------------------------------------------

def test_sketchy_loader(tmp_path):
    from genesis_tpu.data import sketchy_config as sk
    rs = np.random.RandomState(0)
    root = tmp_path / "sketchy"
    for mode in ("train", "valid", "test"):
        d = root / "processed" / mode / "ep000000"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rs.randint(0, 255, (128, 128, 3), np.uint8)).save(
                d / f"ep000000_t{i:03d}_fl_full.png")
    cfg = AttrDict(data_folder=str(root), img_size=128, num_workers=0,
                   K_steps=10, batch_size=2, debug=True, seed=0)
    tng, val, tst = sk.load(cfg)
    batch = next(iter(tng))
    assert batch["input"].shape == (2, 128, 128, 3)
    # Split file was created
    assert osp.exists(root / "processed" / "train_images.txt")


def test_apc_loader(tmp_path):
    from genesis_tpu.data import apc_config as apc
    rs = np.random.RandomState(0)
    root = tmp_path / "apc"
    for scene in range(12):
        d = root / "processed" / "obj" / "env" / f"scene-{scene:04d}"
        (d / "masks").mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rs.randint(0, 255, (128, 128, 3), np.uint8)).save(
                d / f"frame-{i:06d}.color.png")
            if scene % 2 == 0:  # half the scenes have masks
                Image.fromarray(
                    rs.randint(0, 5, (128, 128), np.uint8)).save(
                    d / "masks" / f"frame-{i:06d}.mask.png")
    cfg = AttrDict(data_folder=str(root), img_size=128, num_workers=0,
                   K_steps=10, batch_size=2, debug=True, seed=0)
    tng, val, tst = apc.load(cfg)
    batch = next(iter(tng))
    assert batch["input"].shape == (2, 128, 128, 3)
    assert batch["instances"].shape == (2, 128, 128, 1)
    # Splits persisted + disjoint
    for m in ("train", "val", "test"):
        assert osp.exists(root / f"{m}_images.txt")


# --- generate_multid + multid pipeline -----------------------------------

def test_generate_multid_and_load(tmp_path):
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "generate_multid.py"),
         "--data_folder", str(tmp_path / "md"), "--procedural",
         "--train_size", "12", "--eval_size", "6"],
        capture_output=True, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": ""})
    assert out.returncode == 0, out.stderr
    from genesis_tpu.data import multid_config as md
    cfg = AttrDict(data_folder=str(tmp_path / "md" / "processed"),
                   unique_colours=False, load_instances=True, img_size=64,
                   num_workers=0, mem_map=False, K_steps=5, batch_size=4,
                   debug=True, seed=0)
    tng, val, tst = md.load(cfg)
    assert len(tng) == 3
    batch = next(iter(tng))
    assert batch["input"].shape == (4, 64, 64, 3)
    assert batch["instances"].shape == (4, 64, 64, 1)
    assert batch["input"].dtype == np.uint8  # device-normalised
    assert batch["instances"].max() <= 4
    # unique-colour variant also written
    assert osp.exists(
        tmp_path / "md" / "processed" / "training_images_rand4_unique.npy")


def test_generate_gqn_feeds_loader(tmp_path):
    """The synthetic GQN generator writes registry-shaped tfrecords the
    loader decodes end-to-end (debug stub: 1 train + 1 test file)."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_gqn", osp.join(osp.dirname(osp.dirname(__file__)),
                            "scripts", "generate_gqn_tfrecords.py"))
    gen = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen)
    out = str(tmp_path / "gqn-synth")
    argv = sys.argv
    sys.argv = ["x", "--out", out, "--dataset",
                "rooms_ring_camera_debug", "--records_per_file", "3"]
    try:
        gen.main()
    finally:
        sys.argv = argv
    from genesis_tpu.data import gqn_config as gqn
    loader = gqn.GQNLoader(
        data_folder=out, dataset="rooms_ring_camera_debug",
        mode="train", img_size=64, val_frac=2, batch_size=2,
        buffer_size=2, seed=0, num_frames=6)
    b = next(iter(loader))
    assert b["input"].shape == (2, 64, 64, 3)
    assert b["input"].dtype == np.uint8
    # Rendered rooms, not noise: frames have spatial structure (the
    # column-wise variance of a room image is far below iid noise).
    x = b["input"].astype(np.float32) / 255.0
    assert float(np.var(np.diff(x, axis=1))) < 0.05


def test_generate_apc_feeds_preprocess_and_loader(tmp_path):
    """The synthetic APC generator writes the raw `training/` layout;
    `apc_config.preprocess` (the real resize+crop path) then feeds the
    loader with images AND instance masks."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_apc", osp.join(osp.dirname(osp.dirname(__file__)),
                            "scripts", "generate_apc.py"))
    gen = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen)
    out = str(tmp_path / "apc-synth")
    argv = sys.argv
    sys.argv = ["x", "--out", out, "--scenes", "12",
                "--frames_per_scene", "2"]
    try:
        gen.main()
    finally:
        sys.argv = argv
    from genesis_tpu.data import apc_config as apc
    apc.preprocess(out, 128)
    cfg = AttrDict(data_folder=out, img_size=128, batch_size=2,
                   num_workers=0, K_steps=10, debug=True, seed=0)
    tng, val, tst = apc.load(cfg)
    b = next(iter(tng))
    assert b["input"].shape == (2, 128, 128, 3)
    assert b["instances"].shape == (2, 128, 128, 1)
    # Instance ids survive the nearest-neighbour mask resize.
    assert int(b["instances"].max()) >= 1
    x = b["input"].astype(np.float32) / 255.0
    assert float(np.var(np.diff(x, axis=1))) < 0.05


def test_generate_apc_textured_raises_object_frequency(tmp_path):
    """`generate_apc.py --textured` exists to raise the dataset's
    reconstruction floor with OBJECT-ANCHORED high-frequency albedo
    (stripes/checker/grain), so reconstructing to the GECO goal
    requires per-object appearance. Pin that invariant: with the same
    seed, within-object gradient energy is a multiple of the
    untextured generator's, and the preprocess+loader path still
    feeds images + instance masks."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_apc2", osp.join(osp.dirname(osp.dirname(__file__)),
                             "scripts", "generate_apc.py"))

    def gen_and_load(out, extra):
        gen = ilu.module_from_spec(spec)
        spec.loader.exec_module(gen)
        argv = sys.argv
        sys.argv = ["x", "--out", out, "--scenes", "12",
                    "--frames_per_scene", "2", "--seed", "0"] + extra
        try:
            gen.main()
        finally:
            sys.argv = argv
        from genesis_tpu.data import apc_config as apc
        apc.preprocess(out, 128)
        cfg = AttrDict(data_folder=out, img_size=128, batch_size=4,
                       num_workers=0, K_steps=10, debug=True, seed=0)
        tng, _, _ = apc.load(cfg)
        return next(iter(tng))

    b_flat = gen_and_load(str(tmp_path / "apc-flat"), [])
    b_tex = gen_and_load(str(tmp_path / "apc-tex"), ["--textured"])

    def obj_grad(b):
        x = b["input"].astype(np.float32) / 255.0
        m = (b["instances"][..., 0] > 0)  # object (non-bin) pixels
        gx = np.abs(np.diff(x, axis=2)).mean(-1)  # [B, H, W-1]
        sel = m[:, :, 1:] & m[:, :, :-1]
        assert sel.sum() > 500  # enough interior object pixels
        return float(gx[sel].mean())

    g_flat, g_tex = obj_grad(b_flat), obj_grad(b_tex)
    # Same scenes/seed, textured albedo: >=2x within-object gradient
    # energy (measured ~4-6x; 2x is the regression floor).
    assert g_tex > 2.0 * g_flat, (g_flat, g_tex)
    # Scene layout is seed-identical: same instance count per frame.
    assert int(b_tex["instances"].max()) >= 1
    assert (b_flat["instances"] == b_tex["instances"]).mean() > 0.99


def test_generate_sketchy_episodes_feed_preparation(tmp_path):
    """The synthetic episode generator writes records the REAL
    sketchy_preparation pipeline slices into the processed layout the
    loader consumes (2 cams x [full + 6 crops] per frame)."""
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_sk", osp.join(osp.dirname(osp.dirname(__file__)),
                           "scripts", "generate_sketchy_episodes.py"))
    gen = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen)
    out = str(tmp_path / "sk-synth")
    argv = sys.argv
    sys.argv = ["x", "--out", out, "--episodes", "10",
                "--frames_per_episode", "1"]
    try:
        gen.main()
    finally:
        sys.argv = argv
    subprocess.run(
        [sys.executable, osp.join(REPO, "scripts",
                                  "sketchy_preparation.py"),
         "--data_folder", out, "--subsample", "1"], check=True)
    from genesis_tpu.data import sketchy_config as sk
    cfg = AttrDict(data_folder=out, img_size=128, batch_size=2,
                   num_workers=0, K_steps=10, debug=True, seed=0)
    tng, val, tst = sk.load(cfg)
    # 8 train episodes x 1 frame x 2 cams x 7 images.
    assert len(tng.dataset) == 8 * 14
    b = next(iter(tng))
    assert b["input"].shape == (2, 128, 128, 3)
    x = b["input"].astype(np.float32) / 255.0
    assert float(np.var(np.diff(x, axis=1))) < 0.05


def _run_generator(tmp_path, script, extra_argv):
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "gen_mod", osp.join(REPO, "scripts", script))
    gen = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen)
    argv = sys.argv
    sys.argv = ["x"] + extra_argv
    try:
        gen.main()
    finally:
        sys.argv = argv


def test_generate_clevr_feeds_loader(tmp_path):
    """The synthetic CLEVR generator writes clevr_with_masks-shaped
    tfrecords (240x320, 11 entities) the MultiObjectLoader decodes
    through the IODINE crop-192 protocol."""
    from genesis_tpu.data import multi_object_config as moc
    out = str(tmp_path / "mo")
    _run_generator(tmp_path, "generate_clevr_tfrecords.py",
                   ["--out", out, "--n", "8"])
    loader = moc.MultiObjectLoader(
        path=osp.join(out, "clevr_with_masks",
                      "clevr_with_masks_train.tfrecords"),
        name="clevr", variant=None, skip=0, num_frames=8,
        background_entities=1, batch_size=4, img_size=128,
        buffer_size=2, seed=0)
    b = next(iter(loader))
    assert b["input"].shape == (4, 128, 128, 3)
    assert b["input"].dtype == np.uint8
    assert b["instances"].shape == (4, 128, 128, 1)
    # >=3 objects per scene; entity labels survive crop+resize.
    assert int(b["instances"].max()) >= 2
    # Rendered scenes, not noise: spatial smoothness of the shaded
    # ground plane + objects.
    x = b["input"].astype(np.float32) / 255.0
    assert float(np.var(np.diff(x, axis=1))) < 0.05
    # Raw decode: shadows darken the canvas but are NOT in the masks.
    ex = next(mods.dataset(
        osp.join(out, "clevr_with_masks",
                 "clevr_with_masks_train.tfrecords"), "clevr"))
    assert ex["image"].shape == (240, 320, 3)
    assert ex["mask"].shape == (11, 240, 320)
    union = (ex["mask"] == 255).any(axis=0)
    assert union.all()  # entity masks (incl. background) tile the frame


def test_generate_tetrominoes_feeds_loader(tmp_path):
    """The synthetic tetrominoes generator writes the 35x35/4-entity
    layout for the 32px/K4 protocol; exactly 3 non-overlapping pieces."""
    from genesis_tpu.data import multi_object_config as moc
    out = str(tmp_path / "mo")
    _run_generator(tmp_path, "generate_tetrominoes_tfrecords.py",
                   ["--out", out, "--n", "8"])
    path = osp.join(out, "tetrominoes", "tetrominoes_train.tfrecords")
    loader = moc.MultiObjectLoader(
        path=path, name="tetrominoes", variant=None, skip=0,
        num_frames=8, background_entities=1, batch_size=4, img_size=32,
        buffer_size=2, seed=0)
    b = next(iter(loader))
    assert b["input"].shape == (4, 32, 32, 3)
    assert b["instances"].shape == (4, 32, 32, 1)
    ex = next(mods.dataset(path, "tetrominoes"))
    assert ex["image"].shape == (35, 35, 3)
    assert ex["mask"].shape == (4, 35, 35)
    fg = (ex["mask"][1:] == 255)
    assert all(int(m.sum()) == 4 * 25 for m in fg)  # 4 cells x 5x5 px
    # Pieces don't overlap and background is the complement.
    assert (fg.sum(0) <= 1).all()
    np.testing.assert_array_equal(
        ex["mask"][0] == 255, ~fg.any(axis=0))
