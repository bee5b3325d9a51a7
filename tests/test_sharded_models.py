"""Sharded train steps for the other model families over the 8-device
mesh — notably GENESIS with BatchNorm under GSPMD (global batch stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.data import synthetic
from genesis_tpu.parallel import make_mesh, shard_batch
from genesis_tpu.train import step as step_lib
from genesis_tpu.train.state import create_train_state


def tiny_cfg(**over):
    cfg = AttrDict(
        K_steps=3, img_size=32, pixel_bound=True, pixel_std1=0.7,
        pixel_std2=0.7, comp_ldim=8, comp_enc_channels=8,
        comp_dec_channels=8, comp_dec_layers=2, feat_dim=32,
        montecarlo_kl=True, filter_start=8, attention_latents=16,
        latent_dimension=16, pixel_std=0.7,
        optimiser="adam", learning_rate=1e-4, geco=True, g_goal=0.5655,
        g_lr=1e-5, g_alpha=0.99, g_init=1.0, g_min=1e-10, g_speedup=10.0,
        batch_size=8, train_iter=1000, seed=0)
    cfg.update(over)
    return cfg


@pytest.mark.parametrize("model_path", [
    "genesis_tpu.models.genesis_config",
    "genesis_tpu.models.monet_config",
])
def test_sharded_train_step(model_path):
    import importlib
    mod = importlib.import_module(model_path)
    cfg = tiny_cfg()
    model = mod.load(cfg)
    batch = synthetic.generate_dataset(8, 32, seed=1)
    # uint8 path through the sharded step
    batch["input"] = np.round(batch["input"] * 255).astype(np.uint8)
    state = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices(), model_parallel=1)
    state = step_lib.replicate_state(state, mesh)
    device_batch = shard_batch(mesh, {"input": batch["input"]})
    train_step = step_lib.jit_train_step(
        step_lib.make_train_step(model, cfg))
    for _ in range(2):
        state, metrics = train_step(state, device_batch)
    assert np.isfinite(float(metrics["err"]))
    assert int(state.step) == 2
    if "genesis_config" in model_path:
        # BatchNorm running stats must have been updated under GSPMD
        stats_leaves = jax.tree_util.tree_leaves(state.batch_stats)
        assert stats_leaves
        assert any(float(jnp.abs(s).sum()) > 0 for s in stats_leaves)
