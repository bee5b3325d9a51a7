"""Multi-host (DCN) data parallelism: 2 processes x 4 virtual CPU
devices each, coordinated via `jax.distributed.initialize` through the
env-var contract `parallel.init_distributed` reads. Asserts the sharded
global train step runs across processes and its loss matches the
single-process 8-device step on the same global batch (SURVEY.md
section 2.3 multi-host row — previously dead code)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_step_matches_single_process(tmp_path):
    port = _free_port()
    procs, out_files = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        xla = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            xla + " --xla_force_host_platform_device_count=4").strip()
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        out = tmp_path / f"out_{pid}.json"
        out_files.append(out)
        env["OUT_FILE"] = str(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))

    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    results = [json.load(open(f)) for f in out_files]
    assert {r["process"] for r in results} == {0, 1}
    assert all(r["devices"] == 8 for r in results)
    # Both processes see the same replicated loss.
    np.testing.assert_allclose(results[0]["err"], results[1]["err"],
                               rtol=1e-6)

    # Single-process oracle on the same global batch (the in-process
    # 8-device mesh from conftest).
    import jax

    from genesis_tpu.core.attrdict import AttrDict
    from genesis_tpu.models import genesisv2_config
    from genesis_tpu.parallel import make_mesh, shard_batch
    from genesis_tpu.train import step as step_lib
    from genesis_tpu.train.state import create_train_state

    cfg = AttrDict(
        K_steps=3, img_size=32, feat_dim=32, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, compute_dtype="float32",
        pallas_icsbp=False, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=8, train_iter=1000,
        seed=0)
    model = genesisv2_config.load(cfg)
    global_batch = np.random.RandomState(0).rand(
        8, 32, 32, 3).astype(np.float32)
    mesh = make_mesh()
    state = create_train_state(model, cfg, {"input": global_batch},
                               jax.random.PRNGKey(0))
    state = step_lib.replicate_state(state, mesh)
    batch = shard_batch(mesh, {"input": global_batch})
    train_step = step_lib.jit_train_step(
        step_lib.make_train_step(model, cfg))
    _, metrics = train_step(state, batch)
    oracle = float(np.asarray(metrics["err"]))

    np.testing.assert_allclose(results[0]["err"], oracle, rtol=1e-4)
