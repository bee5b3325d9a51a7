"""Tests for less-travelled paths: CLEVR-style centre crop + resize in
the multi-object loader, checkpoint discovery, misc utils."""

import os

import numpy as np
import pytest

from genesis_tpu.core import experiment
from genesis_tpu.data import tfrecord as tfr
from genesis_tpu.utils.misc import (colour_seg_masks, make_grid,
                                    np_img_centre_crop)


def _clevr_fixture(tmp_path, n=6, entities=11):
    """240x320 images like clevr_with_masks."""
    rs = np.random.RandomState(0)
    recs = []
    for _ in range(n):
        img = rs.randint(0, 255, (240, 320, 3), np.uint8)
        owner = rs.randint(0, entities, (240, 320))
        mask = np.zeros((entities, 240, 320, 1), np.uint8)
        for e in range(entities):
            mask[e, owner == e] = 255
        recs.append(tfr.make_example({
            "image": img.tobytes(),
            "mask": mask.tobytes(),
            "x": [0.0] * entities,
            "y": [0.0] * entities,
            "z": [0.0] * entities,
            "pixel_coords": [0.0] * (entities * 3),
            "rotation": [0.0] * entities,
            "visibility": [1.0] * entities,
        }))
    path = str(tmp_path / "clevr_with_masks_train.tfrecords")
    tfr.write_records(path, recs, compression="GZIP")
    return path


def test_clevr_crop_and_resize(tmp_path):
    """Non-square CLEVR frames: centre crop to 192 then resize to the
    configured img_size (reference multi_object_config.py:51,183)."""
    from genesis_tpu.data import multi_object_config as moc
    path = _clevr_fixture(tmp_path)
    loader = moc.MultiObjectLoader(
        path=path, name="clevr", variant=None, skip=0, num_frames=6,
        background_entities=1, batch_size=2, img_size=128,
        buffer_size=2, seed=0)
    batch = next(iter(loader))
    assert batch["input"].shape == (2, 128, 128, 3)
    assert batch["instances"].shape == (2, 128, 128, 1)
    # Background entity 0 folded to label 0; fg labels 2..11
    labels = set(np.unique(batch["instances"]).tolist())
    assert labels <= set(range(0, 12)) and 1 not in labels


def test_centre_crop_math():
    x = np.arange(5 * 6 * 1).reshape(5, 6, 1)
    c = np_img_centre_crop(x, 3)
    assert c.shape == (3, 3, 1)
    np.testing.assert_array_equal(c[..., 0], x[1:4, 1:4, 0])
    xb = x[None]
    cb = np_img_centre_crop(xb, 3, batch=True)
    np.testing.assert_array_equal(cb[0], c)


def test_find_latest_checkpoint(tmp_path):
    run = str(tmp_path)
    assert experiment.find_latest_checkpoint(run) is None
    open(os.path.join(run, "model.ckpt-100"), "w").close()
    open(os.path.join(run, "model.ckpt-2000"), "w").close()
    assert experiment.find_latest_checkpoint(run).endswith("-2000")
    open(os.path.join(run, "model.ckpt-latest"), "w").close()
    assert experiment.find_latest_checkpoint(run).endswith("-latest")


def test_colour_masks_and_grid():
    seg = np.asarray([[[0, 1], [2, -1]]])       # [1,2,2] with ignore
    rgb = colour_seg_masks(seg)
    assert rgb.shape == (1, 2, 2, 3)
    assert (rgb[0, 1, 1] == 0).all()            # ignore -> black
    assert (rgb[0, 0, 1] != rgb[0, 0, 0]).any()
    grid = make_grid(np.ones((3, 4, 4, 3)), nrow=2, padding=1)
    assert grid.shape == (2 * 5 + 1, 2 * 5 + 1, 3)
