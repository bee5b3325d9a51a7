"""sketchy_preparation end-to-end on synthetic episode tfrecords
(reference scripts/sketchy_preparation.py:22-79): 80/10/10 episode file
split, 2 cameras x [full + 6 crops] 128x128 PNGs per frame, state npz.
Uses the TF-free tfrecord fallback reader path (the deepmind-research
`sketchy` package is absent here)."""

import io
import os.path as osp
from glob import glob

import numpy as np
import pytest

from genesis_tpu.data import tfrecord as tfr

CAMS = ("pixels/basket_front_left", "pixels/basket_front_right")


def _episode_record(seed: int) -> bytes:
    """One frame of a sketchy episode: 600x960 camera PNGs + state."""
    from PIL import Image
    rs = np.random.RandomState(seed)
    feats = {}
    for cam in CAMS:
        img = np.full((600, 960, 3), rs.randint(0, 255), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        feats[cam] = buf.getvalue()
    feats["gripper/joints/velocity"] = [0.1 * seed, -0.5, 2.0]
    return tfr.make_example(feats)


@pytest.fixture(scope="module")
def sketchy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sketchy")
    rec_dir = root / "records"
    rec_dir.mkdir()
    for ep in range(10):
        tfr.write_records(
            str(rec_dir / f"episode_{ep:03d}.tfrecords"),
            [_episode_record(ep)])
    return str(root)


def test_process_splits_and_outputs(sketchy_root):
    from scripts import sketchy_preparation as prep

    prep.process(sketchy_root, subsample=1)

    # 80/10/10 split over 10 episode files -> 8/1/1.
    for mode, expected in (("train", 8), ("valid", 1), ("test", 1)):
        eps = sorted(glob(osp.join(sketchy_root, "processed", mode, "ep*")))
        assert len(eps) == expected, (mode, eps)

    # Every episode frame: 2 cams x (1 full + 6 crops) + state npz.
    ep0 = osp.join(sketchy_root, "processed", "train", "ep000000")
    pngs = sorted(glob(osp.join(ep0, "*.png")))
    assert len(pngs) == 14
    for view in ("fl", "fr"):
        assert glob(osp.join(ep0, f"*_t000_{view}_full.png"))
        for c in range(6):
            assert glob(osp.join(ep0, f"*_t000_{view}_c{c}.png"))

    # All thumbnails are 128x128 (reference THUMBNAIL).
    from PIL import Image
    for p in pngs:
        assert Image.open(p).size == (128, 128)

    # State arrays keep non-pixel features only.
    npz = glob(osp.join(ep0, "*_state.npz"))
    assert len(npz) == 1
    state = np.load(npz[0])
    assert "gripper/joints/velocity" in state.files
    assert not any("pixels" in k for k in state.files)
    # Split takes the FIRST files as valid/test (reference :57-59), so
    # train's first episode is episode_002 (seed 2).
    np.testing.assert_allclose(
        state["gripper/joints/velocity"], [0.2, -0.5, 2.0], atol=1e-6)


def test_processed_episodes_feed_sketchy_loader(sketchy_root):
    """The prep output must be loadable by the sketchy data config."""
    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.data import sketchy_config

    cfg = AttrDict(data_folder=sketchy_root, batch_size=2, img_size=128,
                   num_workers=0, debug=True, seed=0)
    train, val, test = sketchy_config.load(cfg)
    batch = next(iter(train))
    assert batch["input"].shape == (2, 128, 128, 3)
    assert batch["input"].dtype in (np.uint8, np.float32)
