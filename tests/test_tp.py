"""Tensor parallelism: the `model` mesh axis must actually carry sharded
tensors (SURVEY.md section 2.3 TP row). Verifies on the 8-virtual-CPU
mesh that (a) GenesisV2.tp_rules() shards decoder/z_head/bottleneck
kernels AND their adam moments over `model`, and (b) the TP-sharded
train step computes the same loss as the replicated (DP-only) step —
GSPMD partitioning must not change the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.parallel import make_mesh, shard_batch
from genesis_tpu.train import step as step_lib
from genesis_tpu.train.state import create_train_state

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _tiny_cfg():
    return AttrDict(
        K_steps=3, img_size=32, feat_dim=32, pixel_bound=True,
        pixel_std1=0.7, pixel_std2=0.7, compute_dtype="float32",
        pallas_icsbp=False, optimiser="adam", learning_rate=1e-4,
        geco=True, g_goal=0.5655, g_lr=1e-5, g_alpha=0.99, g_init=1.0,
        g_min=1e-10, g_speedup=10.0, batch_size=8, train_iter=1000,
        seed=0)


@pytest.fixture(scope="module")
def setup():
    from genesis_tpu.models import genesisv2_config
    cfg = _tiny_cfg()
    model = genesisv2_config.load(cfg)
    batch = {"input": np.random.RandomState(0)
             .rand(8, 32, 32, 3).astype(np.float32)}
    return cfg, model, batch


def _spec_names(leaf):
    return {ax for part in leaf.sharding.spec if part
            for ax in ((part,) if isinstance(part, str) else part)}


def test_tp_params_actually_sharded(setup):
    cfg, model, batch = setup
    mesh = make_mesh(model_parallel=2)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    state = step_lib.shard_state(state, mesh, model.tp_rules())

    p = state.params
    # Decoder deconv kernels: out-channel dim sharded over `model`.
    for i in range(4):
        leaf = p[f"dec_convs_{i}"]["kernel"]
        assert "model" in _spec_names(leaf), leaf.sharding
        assert leaf.sharding.spec[3] == "model"
    # z_head + UNet bottleneck Denses.
    assert "model" in _spec_names(p["z_head"]["layers_1"]["kernel"])
    assert "model" in _spec_names(p["encoder"]["Dense_0"]["kernel"])
    # Norm scales stay replicated.
    assert not _spec_names(p["dec_norms_0"]["scale"])

    # Adam moments shard consistently with their params (same key paths).
    def find_moment_leaf(tree):
        found = []

        def visit(path, leaf):
            ps = jax.tree_util.keystr(path)
            if "dec_convs_0" in ps and "kernel" in ps:
                found.append(leaf)
            return leaf

        jax.tree_util.tree_map_with_path(visit, tree)
        return found

    moments = find_moment_leaf(state.opt_state)
    assert moments, "adam state must contain dec_convs_0/kernel moments"
    for leaf in moments:
        assert "model" in _spec_names(leaf), leaf.sharding


def test_tp_step_matches_replicated(setup):
    cfg, model, batch = setup
    step_fn = step_lib.make_train_step(model, cfg)
    device_batch_host = {"input": batch["input"]}

    def run(model_parallel, rules):
        mesh = make_mesh(model_parallel=model_parallel)
        state = create_train_state(model, cfg, batch,
                                   jax.random.PRNGKey(0))
        state = step_lib.shard_state(state, mesh, rules)
        db = shard_batch(mesh, device_batch_host)
        train_step = step_lib.jit_train_step(step_fn)
        errs = []
        for _ in range(3):
            state, metrics = train_step(state, db)
            errs.append(float(np.asarray(metrics["err"])))
        return errs, float(np.asarray(metrics["elbo"]))

    errs_dp, elbo_dp = run(1, None)
    errs_tp, elbo_tp = run(2, model.tp_rules())
    np.testing.assert_allclose(errs_tp, errs_dp, rtol=1e-4)
    np.testing.assert_allclose(elbo_tp, elbo_dp, rtol=1e-4)
