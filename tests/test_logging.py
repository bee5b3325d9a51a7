"""MetricsLogger contracts: machine-readable scalars.jsonl rows, PNG
image dumps, TB mirror best-effort (reference logs via tensorboardX,
train.py:28,144-145; the jsonl is this framework's always-on record)."""

import json
import os.path as osp

import numpy as np

from genesis_tpu.utils.logging import MetricsLogger


def _rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_scalars_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log_scalars({"err": np.float32(1.5), "beta": 2.0}, "train", 10)
    logger.log_scalars({"ari": np.asarray(0.25)}, "val", 20)
    logger.close()
    rows = _rows(osp.join(str(tmp_path), "scalars.jsonl"))
    assert rows[0] == {"step": 10, "tag": "train", "err": 1.5, "beta": 2.0}
    assert rows[1] == {"step": 20, "tag": "val", "ari": 0.25}


def test_log_image_png(tmp_path):
    from PIL import Image
    logger = MetricsLogger(str(tmp_path))
    img = np.zeros((4, 6, 3), np.float32)
    img[..., 0] = 1.0
    logger.log_image("train_recon/k0", img, 7)
    # greyscale channel gets broadcast to RGB
    logger.log_image("mask", np.full((4, 6, 1), 0.5, np.float32), 7)
    logger.close()
    p = osp.join(str(tmp_path), "images", "train_recon_k0_7.png")
    arr = np.asarray(Image.open(p))
    assert arr.shape == (4, 6, 3)
    np.testing.assert_array_equal(arr[..., 0], 255)
    np.testing.assert_array_equal(arr[..., 1:], 0)
    grey = np.asarray(Image.open(osp.join(str(tmp_path), "images",
                                          "mask_7.png")))
    assert grey.shape == (4, 6, 3)
    assert np.unique(grey).tolist() == [127]


def test_histogram_and_close_no_tb_is_noop(tmp_path, monkeypatch):
    """Without a TB backend the logger must still work (jsonl + PNGs)."""
    logger = MetricsLogger(str(tmp_path))
    logger.tb = None  # simulate no tensorboard backend importable
    logger.log_histogram("w", np.arange(5), 1)  # no-op, no crash
    logger.log_scalars({"x": 1}, "train", 1)
    logger.close()
    assert _rows(osp.join(str(tmp_path), "scalars.jsonl"))
