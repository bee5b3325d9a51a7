"""The jitted train/eval steps.

Loss assembly follows reference train.py:222-263: batch-mean recon error,
slot-summed batch-mean KLs, GECO or (warmed-up) beta ELBO, single optimiser
step. Everything — forward, backward, optimiser, GECO update — is one XLA
program with the state donated, so a training step is a single device
launch with no host sync.

Data parallelism: the returned step is jitted over a (data, model) mesh
with the batch sharded on `data` and state replicated; XLA inserts the
gradient all-reduce over ICI.
"""

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from genesis_tpu.data.loader import prepare_input
from genesis_tpu.ops import geco as geco_lib
from genesis_tpu.parallel import mesh as mesh_lib
from genesis_tpu.train.state import TrainState, make_optimiser


def combine_kl(losses) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kl_m, kl_l) scalars: slot arrays [K,B] are summed over slots and
    averaged over the batch (reference train.py:229-239)."""
    kl_m = jnp.asarray(0.0)
    kl_l = jnp.asarray(0.0)
    if "kl_m" in losses:
        kl_m = jnp.mean(losses["kl_m"])
    elif "kl_m_k" in losses:
        kl_m = jnp.mean(jnp.sum(losses["kl_m_k"], axis=0))
    if "kl_l" in losses:
        kl_l = jnp.mean(losses["kl_l"])
    elif "kl_l_k" in losses:
        kl_l = jnp.mean(jnp.sum(losses["kl_l_k"], axis=0))
    return kl_m, kl_l


def make_loss_fn(model, cfg) -> Callable:
    """The training objective (params, state, prepared batch, rng key) ->
    (loss, aux) — shared by the train step and the grad-histogram probe
    so both differentiate the exact same program."""
    use_geco = cfg.get("geco", True)
    beta_cfg = float(cfg.get("beta", 0.5))
    beta_warmup = bool(cfg.get("beta_warmup", False))
    train_iter = int(cfg.get("train_iter", 500000))

    def loss_fn(params, state: TrainState, batch, step_key):
        has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))

        # Beta for the non-GECO objective (reference train.py:253-259).
        if use_geco:
            beta = state.geco["beta"]
        elif beta_warmup:
            beta = jnp.clip(
                beta_cfg * state.step / (0.2 * train_iter), 0.0, beta_cfg)
        else:
            beta = jnp.asarray(beta_cfg)

        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, batch["input"], True,
                rngs={"sample": step_key}, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            out = model.apply(variables, batch["input"], True,
                              rngs={"sample": step_key})
            new_stats = state.batch_stats
        recon, losses, stats, att_stats, comp_stats = out
        err = jnp.mean(losses["err"])
        kl_m, kl_l = combine_kl(losses)
        if use_geco:
            loss, new_geco = geco_lib.loss(
                state.geco, err, kl_l + kl_m)
        else:
            loss = err + beta * (kl_l + kl_m)
            new_geco = state.geco
        mse_b = jnp.mean((batch["input"] - recon) ** 2,
                         axis=(1, 2, 3))
        aux = {
            "new_stats": new_stats,
            "new_geco": new_geco,
            "losses": losses,
            "metrics": {
                "err": err, "kl_m": kl_m, "kl_l": kl_l,
                "elbo": err + kl_m + kl_l,
                # Batch-mean of per-image (R)MSE, reference
                # train.py:243-246
                "mse": jnp.mean(mse_b),
                "rmse": jnp.mean(jnp.sqrt(mse_b)),
                "beta": beta,
            },
        }
        return loss, aux

    return loss_fn


def make_train_step(model, cfg) -> Callable[[TrainState, Dict], Tuple]:
    """Build the pure train step (state, batch) -> (state, metrics)."""
    tx = make_optimiser(cfg.optimiser, cfg.learning_rate)
    use_geco = cfg.get("geco", True)
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        batch = dict(batch)
        batch["input"] = prepare_input(batch["input"])
        rng, step_key = jax.random.split(state.rng)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state, batch, step_key)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = dict(aux["metrics"])
        metrics["loss"] = loss
        if use_geco:
            metrics["geco_beta"] = aux["new_geco"]["beta"]
            metrics["geco_err_ema"] = aux["new_geco"]["err_ema"]
        # Per-slot KL traces for TB (reference train.py:307-311).
        for key in ("kl_l_k", "kl_m_k"):
            if key in aux["losses"]:
                metrics[key] = jnp.mean(aux["losses"][key], axis=1)  # [K]

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["new_stats"],
            opt_state=new_opt_state,
            geco=aux["new_geco"],
            rng=rng)
        return new_state, metrics

    return train_step


def make_grad_probe(model, cfg) -> Callable:
    """(state, batch) -> gradient pytree of the live training objective,
    for `--log_grads_and_weights` histograms (reference train.py:339-345
    logs param.grad alongside param.data). Jitted separately and invoked
    only on the validation cadence, so the hot train step never
    materialises per-parameter grads for logging."""
    loss_fn = make_loss_fn(model, cfg)

    def grad_probe(state: TrainState, batch):
        batch = dict(batch)
        batch["input"] = prepare_input(batch["input"])
        _, step_key = jax.random.split(state.rng)
        grads, _ = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch, step_key)
        return grads

    return grad_probe


def make_eval_step(model, cfg,
                   seg_metrics: bool = True) -> Callable:
    """Eval step: losses + ELBO (+ vectorised in-jit ARI/MSC when instance
    labels are present). Replaces the reference's per-image sklearn loop
    (train.py:535-559, the eval hotspot)."""
    from genesis_tpu.eval import metrics as M

    def eval_step(state: TrainState, batch, key) -> Dict:
        batch = dict(batch)
        batch["input"] = prepare_input(batch["input"])
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        recon, losses, stats, att_stats, comp_stats = model.apply(
            variables, batch["input"], False, rngs={"sample": key})
        out: Dict[str, Any] = {}
        for key_, val in losses.items():
            if val.ndim == 2:  # [K, B] slot arrays -> sum slots, mean batch
                out[key_] = jnp.mean(jnp.sum(val, axis=0))
            else:
                out[key_] = jnp.mean(val)
        kl_m, kl_l = combine_kl(losses)
        out["elbo"] = jnp.mean(losses["err"]) + kl_m + kl_l
        out["mse"] = jnp.mean((batch["input"] - recon) ** 2)

        if seg_metrics and "instances" in batch:
            gt = batch["instances"]
            if gt.ndim == 4:
                gt = gt[..., 0]
            for mode, suffix in (("log_m_k", ""), ("log_m_r_k", "_r")):
                if mode not in stats:
                    continue
                pred = jnp.argmax(stats[mode][..., 0], axis=0)  # [B,H,W]
                num_pred = stats[mode].shape[0]
                ari = M.adjusted_rand_index(pred, gt, num_pred)
                ari_fg = M.adjusted_rand_index(pred, gt, num_pred,
                                               fg_only=True)
                msc, _ = M.segmentation_covering(gt, pred, num_pred)
                msc_fg, _ = M.segmentation_covering(
                    gt, pred, num_pred, ignore_background=True)
                out["ari" + suffix] = jnp.mean(ari)
                out["ari_fg" + suffix] = jnp.mean(ari_fg)
                out["msc" + suffix] = jnp.mean(msc)
                out["msc_fg" + suffix] = jnp.mean(msc_fg)
        return out

    return eval_step


def jit_train_step(train_step) -> Callable:
    """Jit the train step with donated state. Sharding follows the data:
    put the state with a replicated sharding and the batch with a
    data-axis sharding (parallel.shard_batch) and GSPMD partitions the
    step, inserting the gradient all-reduce over ICI."""
    return jax.jit(train_step, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place the train state on the mesh, fully replicated."""
    repl = mesh_lib.replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state)


def shard_state(state: TrainState, mesh, rules=None) -> TrainState:
    """Place the train state on the mesh: tensor-parallel leaves sharded
    per `rules` (see parallel.mesh.shard_tree — matching adam moments
    shard with their params), everything else replicated. rules=None is
    plain DP (replicated)."""
    if not rules:
        return replicate_state(state, mesh)
    return mesh_lib.shard_tree(state, mesh, rules)
