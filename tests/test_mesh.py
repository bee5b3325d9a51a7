"""Direct unit tests for parallel/mesh.py (the DP/TP mesh backend —
SURVEY.md section 2.3: mesh construction IS the comms backend; XLA emits
the collectives from these shardings)."""

import jax
import numpy as np
import pytest

from genesis_tpu.parallel import mesh as mesh_lib


def test_make_mesh_shapes():
    devices = jax.devices()
    m = mesh_lib.make_mesh(devices)
    assert dict(m.shape) == {"data": len(devices), "model": 1}
    if len(devices) % 2 == 0 and len(devices) >= 2:
        m2 = mesh_lib.make_mesh(devices, model_parallel=2)
        assert dict(m2.shape) == {"data": len(devices) // 2, "model": 2}


def test_make_mesh_batch_clamp():
    """Data axis clamps to the largest batch divisor that fits, so small
    (e.g. --debug batch-2) runs work on many-device hosts."""
    devices = jax.devices()
    n = len(devices)
    m = mesh_lib.make_mesh(devices, batch_size=2)
    assert dict(m.shape)["data"] == (2 if n >= 2 else 1)
    # Divisible batches keep the full device complement.
    m = mesh_lib.make_mesh(devices, batch_size=4 * n)
    assert dict(m.shape)["data"] == n
    if n >= 4:
        # batch 6 on 8 devices -> 6-device data axis (subset), not gcd=2
        m = mesh_lib.make_mesh(devices[:4], batch_size=3)
        assert dict(m.shape)["data"] == 3


def test_make_mesh_indivisible_raises():
    devices = jax.devices()
    with pytest.raises(ValueError, match="not divisible"):
        mesh_lib.make_mesh(devices, model_parallel=len(devices) + 1)


def test_shard_batch_layout():
    m = mesh_lib.make_mesh()
    n = dict(m.shape)["data"]
    batch = {"input": np.arange(n * 4 * 2, dtype=np.float32)
             .reshape(n * 4, 2)}
    out = mesh_lib.shard_batch(m, batch)
    assert out["input"].shape == (n * 4, 2)
    np.testing.assert_array_equal(np.asarray(out["input"]),
                                  batch["input"])
    spec = out["input"].sharding.spec
    assert spec[0] == "data"
    # each device holds 1/n of the batch dim
    shard_shapes = {s.data.shape for s in out["input"].addressable_shards}
    assert shard_shapes == {(4, 2)}


def test_device_prefetch_order_and_completeness():
    m = mesh_lib.make_mesh()
    n = dict(m.shape)["data"]
    batches = [{"input": np.full((n, 3), i, np.float32)}
               for i in range(5)]
    out = list(mesh_lib.device_prefetch(iter(batches), m, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["input"]),
                                      batches[i]["input"])
        assert b["input"].sharding.spec[0] == "data"


def test_device_prefetch_short_stream():
    """Streams shorter than the prefetch window still drain fully."""
    m = mesh_lib.make_mesh()
    n = dict(m.shape)["data"]
    batches = [{"input": np.zeros((n, 2), np.float32)}]
    out = list(mesh_lib.device_prefetch(iter(batches), m, size=4))
    assert len(out) == 1
