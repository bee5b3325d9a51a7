"""TFRecord/Example parsing + multi-object pipeline tests using
fixtures written by our own writer (and cross-checked against
tensorflow-free golden bytes)."""

import gzip
import os.path as osp

import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.data import tfrecord as tfr
from genesis_tpu.data import multi_object_datasets as mods


def test_crc32c_known_values():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfr.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfr.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_record_roundtrip(tmp_path):
    recs = [b"hello", b"world" * 100, b""]
    path = str(tmp_path / "plain.tfrecords")
    tfr.write_records(path, recs)
    out = list(tfr.iter_records(path, verify_crc=True))
    assert out == recs
    # GZIP
    gz = str(tmp_path / "gz.tfrecords")
    tfr.write_records(gz, recs, compression="GZIP")
    out = list(tfr.iter_records(gz, compression="GZIP", verify_crc=True))
    assert out == recs
    # skip
    out = list(tfr.iter_records(path, skip=2))
    assert out == [b""]
    # index for random access
    index = tfr.build_index(path)
    assert len(index) == 3
    with open(path, "rb") as f:
        assert tfr.read_record_at(f, *index[1]) == recs[1]


def test_example_roundtrip():
    ex = tfr.make_example({
        "img": b"\x01\x02\x03\x04",
        "floats": [1.5, -2.0, 3.25],
        "ints": [7, 1 << 40, 0],
    })
    parsed = tfr.parse_example(ex)
    assert parsed["img"] == [b"\x01\x02\x03\x04"]
    np.testing.assert_allclose(parsed["floats"], [1.5, -2.0, 3.25])
    np.testing.assert_array_equal(parsed["ints"], [7, 1 << 40, 0])


def _objects_room_fixture(tmp_path, n=8, entities=7):
    rs = np.random.RandomState(0)
    recs = []
    images, masks = [], []
    for _ in range(n):
        img = rs.randint(0, 255, (64, 64, 3), np.uint8)
        # one-hot-ish entity masks: each pixel owned by one entity
        owner = rs.randint(0, entities, (64, 64))
        mask = np.zeros((entities, 64, 64, 1), np.uint8)
        for e in range(entities):
            mask[e, owner == e] = 255
        images.append(img)
        masks.append(mask)
        recs.append(tfr.make_example({
            "image": img.tobytes(),
            "mask": mask.tobytes(),
        }))
    path = str(tmp_path / "objects_room_train.tfrecords")
    tfr.write_records(path, recs, compression="GZIP")
    return path, images, masks


def test_uncompressed_tfrecords_auto_detected(tmp_path):
    """compression="auto" reads plain (non-GZIP) tfrecord files via
    magic-byte detection — uncompressed files skip the inflate cost."""
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (64, 64, 3), np.uint8)
    mask = np.zeros((7, 64, 64, 1), np.uint8)
    mask[0] = 255
    rec = tfr.make_example({"image": img.tobytes(),
                            "mask": mask.tobytes()})
    path = str(tmp_path / "plain.tfrecords")
    tfr.write_records(path, [rec], compression=None)
    assert tfr.detect_compression(path) is None
    out = list(mods.dataset(path, "objects_room", "train"))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0]["image"], img)
    assert tfr.count_records(path, compression="auto") == 1

    gz = str(tmp_path / "gz.tfrecords")
    tfr.write_records(gz, [rec], compression="GZIP")
    assert tfr.detect_compression(gz) == "GZIP"
    assert tfr.count_records(gz, compression="auto") == 1


def test_objects_room_reader(tmp_path):
    path, images, masks = _objects_room_fixture(tmp_path)
    out = list(mods.dataset(path, "objects_room", "train"))
    assert len(out) == 8
    np.testing.assert_array_equal(out[0]["image"], images[0])
    np.testing.assert_array_equal(out[0]["mask"], masks[0][..., 0])
    out2 = list(mods.dataset(path, "objects_room", "train", skip=6))
    assert len(out2) == 2
    np.testing.assert_array_equal(out2[0]["image"], images[6])


def test_multi_object_loader_batches(tmp_path):
    from genesis_tpu.data import multi_object_config as moc
    path, images, masks = _objects_room_fixture(tmp_path, n=12)
    loader = moc.MultiObjectLoader(
        path=path, name="objects_room", variant="train", skip=0,
        num_frames=12, background_entities=4, batch_size=4, img_size=64,
        buffer_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["input"].shape == (4, 64, 64, 3)
    # Loaders ship uint8; prepare_input normalises on device
    assert b["input"].dtype == np.uint8
    assert b["instances"].shape == (4, 64, 64, 1)
    # Background entities 0..3 fold to label 0; foreground 4..6 -> 5..7
    labels = np.unique(b["instances"])
    assert labels.min() >= 0
    assert set(labels.tolist()) <= {0, 5, 6, 7}


def test_multi_object_config_split(tmp_path):
    from genesis_tpu.data import multi_object_config as moc
    # Shrink the split sizes by monkeypatching through dataset_size
    path, _, _ = _objects_room_fixture(tmp_path, n=12)
    import genesis_tpu.data.multi_object_config as cfgmod
    cfg = AttrDict(data_folder=str(tmp_path), dataset="objects_room",
                   img_size=-1, K_steps=-1, dataset_size=-1,
                   batch_size=2, buffer_size=2, debug=True, seed=0)
    # Patch split sizes for the tiny fixture
    orig = cfgmod.load
    try:
        # emulate: total 12, test 4, val 4, train 4
        import types
        tng = moc.MultiObjectLoader(
            path=path, name="objects_room", variant="train", skip=8,
            num_frames=4, background_entities=4, batch_size=2,
            img_size=64, buffer_size=2, seed=0)
        tst = moc.MultiObjectLoader(
            path=path, name="objects_room", variant="train", skip=0,
            num_frames=4, background_entities=4, batch_size=2,
            img_size=64, buffer_size=2, seed=0)
        tng_imgs = np.concatenate([b["input"] for b in tng])
        tst_imgs = np.concatenate([b["input"] for b in tst])
        # Disjoint: no train image equals any test image
        for ti in tng_imgs:
            assert not any(np.array_equal(ti, si) for si in tst_imgs)
    finally:
        cfgmod.load = orig


def test_multi_object_loader_threaded_matches_sequential(tmp_path):
    """num_workers>0 pipeline yields the same example multiset and batch
    shapes as the sequential path (order may differ: decode is
    concurrent, the shuffle buffer absorbs it)."""
    from genesis_tpu.data import multi_object_config as moc
    path, images, masks = _objects_room_fixture(tmp_path, n=12)
    kw = dict(path=path, name="objects_room", variant="train", skip=0,
              num_frames=12, background_entities=4, batch_size=4,
              img_size=64, buffer_size=2, seed=0)
    seq = list(moc.MultiObjectLoader(**kw))
    thr = list(moc.MultiObjectLoader(num_workers=3, **kw))
    assert len(thr) == len(seq) == 3
    for b in thr:
        assert b["input"].shape == (4, 64, 64, 3)
        assert b["input"].dtype == np.uint8
        assert b["instances"].shape == (4, 64, 64, 1)
    # Same multiset of images across the epoch.
    def key_set(batches):
        return sorted(bytes(im.tobytes())
                      for b in batches for im in b["input"])
    assert key_set(thr) == key_set(seq)
    # Two epochs from the threaded loader both yield everything.
    thr_loader = moc.MultiObjectLoader(num_workers=2, **kw)
    assert key_set(list(thr_loader)) == key_set(seq)
    assert key_set(list(thr_loader)) == key_set(seq)
