"""Native C++ tfrecord library: parity with the pure-Python path."""

import os
import time

import numpy as np
import pytest

from genesis_tpu import native
from genesis_tpu.data import tfrecord as tfr


@pytest.fixture(scope="module")
def lib():
    l = native.lib()
    if l is None:
        pytest.skip("native library unavailable")
    return l


def _fixture(tmp_path, n=16, payload=4096, compression=None):
    rs = np.random.RandomState(0)
    recs = []
    for i in range(n):
        img = rs.randint(0, 255, payload, dtype=np.uint8).tobytes()
        recs.append(tfr.make_example({
            "image": img,
            "floats": rs.rand(7).astype(np.float32).tolist(),
            "ints": [i, i * 1000],
        }))
    path = str(tmp_path / "native_test.tfrecords")
    tfr.write_records(path, recs, compression=compression)
    return path, recs


def test_crc32c_native_matches_python(lib):
    for data in (b"", b"\x00" * 32, b"hello world", os.urandom(1000)):
        assert lib.gt_crc32c(data, len(data)) == tfr.crc32c(data)


@pytest.mark.parametrize("compression", [None, "GZIP"])
def test_native_stream_matches_python(tmp_path, lib, compression):
    path, recs = _fixture(tmp_path, compression=compression)
    native_out = list(tfr._iter_records_native(
        lib, path, compression, True, 0))
    assert native_out == recs
    # skip
    out = list(tfr._iter_records_native(lib, path, compression, False, 10))
    assert out == recs[10:]


def test_native_extract_matches_python(tmp_path, lib):
    path, recs = _fixture(tmp_path, n=2)
    rec = recs[0]
    parsed = tfr.parse_example(rec)
    img = tfr.extract_bytes(rec, "image")
    np.testing.assert_array_equal(
        img, np.frombuffer(b"".join(parsed["image"]), np.uint8))
    floats = tfr.extract_floats(rec, "floats")
    np.testing.assert_allclose(floats, parsed["floats"], rtol=1e-6)
    assert tfr.extract_bytes(rec, "missing") is None
    vals = tfr.bytes_values(rec, "image")
    assert vals == parsed["image"]


def test_native_parse_speedup(tmp_path, lib):
    """The native extractor should beat pure-Python parse_example by a
    wide margin on objects_room-sized records (~33KB)."""
    path, recs = _fixture(tmp_path, n=64, payload=32768)
    rec = recs[0]

    t0 = time.perf_counter()
    for _ in range(50):
        tfr.parse_example(rec)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(50):
        tfr.extract_bytes(rec, "image")
    t_native = time.perf_counter() - t0

    assert t_native < t_py, (t_native, t_py)
