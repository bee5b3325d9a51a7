"""The training loop (reference train.py:94-407, TPU-native).

Differences from the reference that are deliberate TPU design choices:
  * One jitted, donated-state train step (forward+backward+optimiser+GECO)
    per iteration; no per-step host sync — heartbeat/divergence checks only
    materialise metrics every `report_loss_every` steps.
  * Data parallelism via a (data, model) mesh + GSPMD instead of
    nn.DataParallel; batches are device_put with a data-axis sharding.
  * Eval seg-metrics (ARI/MSC) run vectorised inside jit.
"""

import sys
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genesis_tpu.core import experiment as fet
from genesis_tpu.core.attrdict import AttrDefault
from genesis_tpu.core.experiment import fprint
from genesis_tpu.eval import metrics as M
from genesis_tpu.parallel import make_mesh
from genesis_tpu.train import checkpoint as ckpt_lib
from genesis_tpu.train import step as step_lib
from genesis_tpu.train.state import TrainState, create_train_state
from genesis_tpu.utils.logging import MetricsLogger
from genesis_tpu.utils.misc import colour_seg_masks, make_grid

# ELBO divergence threshold for stopping training (reference train.py:42).
ELBO_DIV = 1e8


def evaluation(model, eval_step, state, data_loader, logger, cfg,
               iter_idx, N_eval=None, N_seg_metrics=50) -> Dict:
    """Validation/test evaluation (reference train.py:479-589)."""
    batch_size = data_loader.batch_size
    if iter_idx == 0 or cfg.get("debug", False):
        num_batches = min(5, len(data_loader))
        fprint(f"ITER 0 / DEBUG - eval on {num_batches} batches", True)
    elif N_eval is not None and N_eval <= len(data_loader) * batch_size:
        num_batches = int(N_eval // batch_size)
        fprint(f"N_eval = {N_eval}, eval on {num_batches} batches", True)
    else:
        num_batches = len(data_loader)
        fprint(f"Eval on all {num_batches} batches")

    start_t = time.time()
    sums = AttrDefault(float)
    counts = AttrDefault(int)
    key = jax.random.PRNGKey(cfg.get("seed", 0) + 1234 + int(iter_idx))
    nelements = None
    batch = None
    for b_idx, batch in enumerate(data_loader):
        if b_idx == num_batches:
            break
        nelements = int(np.prod(batch["input"].shape[1:]))
        want_seg = ("instances" in batch and
                    b_idx * batch_size < N_seg_metrics)
        if not want_seg:
            batch = {"input": batch["input"]}
        key, sub = jax.random.split(key)
        out = eval_step(state, batch, sub)
        for k, v in out.items():
            is_seg = any(s in k for s in ("ari", "msc"))
            if is_seg and not want_seg:
                continue
            sums[k] += float(np.asarray(v))
            counts[k] += 1

    # Debug-mode invariant: masks must sum to one (the reference's
    # check_log_masks asserts, misc.py:258-270, gated on debug/eval).
    if cfg.get("debug", False) and batch is not None:
        from genesis_tpu.data.loader import prepare_input
        from genesis_tpu.utils.misc import check_log_masks
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        _, _, mstats, _, _ = model.apply(
            variables, prepare_input(jnp.asarray(batch["input"])), False,
            rngs={"sample": key})
        for field in ("log_m_k", "log_m_r_k"):
            if field in mstats:
                check_log_masks(np.asarray(mstats[field]))

    stats = {k: sums[k] / max(counts[k], 1) for k in sums}
    if "err" in stats and nelements:
        stats["err_element"] = stats["err"] / nelements
    duration = time.time() - start_t
    fprint(f"Eval duration: {duration:.1f}s, "
           f"{num_batches / max(duration, 1e-9):.1f} b/s")
    stats["duration"] = duration
    stats["num_batches"] = num_batches
    if logger is not None:
        logger.log_scalars(stats, "val", iter_idx)
    return stats


def make_vis_fns(model):
    """Jitted forward + sample for the image-logging path, so the 25k-step
    visualisation cadence doesn't re-trace model.apply eagerly on host."""
    fwd = jax.jit(lambda variables, x, key: model.apply(
        variables, x, False, rngs={"sample": key}))
    sample = jax.jit(lambda variables, key: model.apply(
        variables, 8, rngs={"sample": key}, method=model.sample))
    return fwd, sample


def visualise_outputs(model, state, vis_batch, logger, mode, iter_idx,
                      sample_key, vis_fns=None):
    """Image grids: input/recon/instances/per-slot decomposition/samples
    (reference train.py:423-476)."""
    from genesis_tpu.data.loader import prepare_input
    if vis_fns is None:
        vis_fns = make_vis_fns(model)
    vis_forward, vis_sample = vis_fns
    vis_input = prepare_input(jnp.asarray(vis_batch["input"][:8]))
    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    recon, losses, stats, att_stats, comp_stats = vis_forward(
        variables, vis_input, sample_key)
    logger.log_image(mode + "_input", make_grid(np.asarray(vis_input)),
                     iter_idx)
    logger.log_image(mode + "_recon", make_grid(np.asarray(recon)),
                     iter_idx)
    if "instances" in vis_batch:
        grid = make_grid(
            colour_seg_masks(np.asarray(vis_batch["instances"][:8])) / 255.)
        logger.log_image(mode + "_instances_gt", grid, iter_idx)
    for field, name in (("log_m_k", "_instances"),
                        ("log_m_r_k", "_instances_r")):
        if field in stats:
            seg = np.asarray(M.masks_to_segmentation(stats[field]))
            logger.log_image(mode + name,
                             make_grid(colour_seg_masks(seg) / 255.),
                             iter_idx)
    for key in ("mx_r_k", "x_r_k", "log_m_k", "log_m_r_k"):
        if key not in stats:
            continue
        val = stats[key]
        if "log" in key:
            val = jnp.exp(val)
        for k in range(val.shape[0]):
            logger.log_image(f"{mode}_{key}/k{k}",
                             make_grid(np.asarray(val[k])), iter_idx)
    # Generation
    try:
        out, gstats = vis_sample(variables, sample_key)
        logger.log_image("samples", make_grid(np.asarray(out)), iter_idx)
        for key in ("x_k", "log_m_k", "mx_k"):
            if key not in gstats:
                continue
            val = gstats[key]
            if "log" in key:
                val = jnp.exp(val)
            for k in range(val.shape[0]):
                logger.log_image(f"gen_{key}/k{k}",
                                 make_grid(np.asarray(val[k])), iter_idx)
    except NotImplementedError:
        fprint("Sampling not implemented for this model.")


def train(cfg) -> TrainState:
    """Main training entry (reference train.py:94-407)."""
    import os.path as osp

    if cfg.get("debug", False):
        cfg.num_workers = 0
        cfg.batch_size = 2
        cfg.train_iter = 10
        cfg.report_loss_every = 1
        cfg.run_validation_every = 5

    # Run dir / resume
    logdir = osp.join(cfg.results_dir, cfg.run_name)
    import os
    if cfg.get("resume", False) and not osp.exists(logdir):
        fprint("WARNING: Tried to resume training but couldn't find "
               "logdir; training from scratch instead", True)
        cfg.resume = False
    run_dir, resume_ckpt = fet.init_checkpoint(
        logdir, cfg.data_config, cfg.model_config, cfg.get("resume", False),
        cfg=cfg)
    checkpoint_name = osp.join(run_dir, "model.ckpt")
    logger = MetricsLogger(run_dir)

    # Print active flags (reference train.py:139-142)
    from genesis_tpu.core.flagparse import print_flags
    print_flags(cfg)

    # Data & model via the config-file contract
    train_loader, val_loader, test_loader = fet.load(cfg.data_config, cfg)
    model = fet.load(cfg.model_config, cfg)

    # Mesh + state
    mesh = make_mesh(model_parallel=cfg.get("model_parallel", 1),
                     batch_size=cfg.batch_size)
    fprint(f"Mesh: {mesh.shape} over {len(jax.devices())} devices")
    try:
        example_batch = next(iter(train_loader))
    except StopIteration:
        raise ValueError(
            "Train loader yielded no batches — the dataset is empty. "
            "Check --data_folder and any preprocessing the data config "
            "requires (e.g. apc_config.preprocess populates processed/; "
            "stale empty split .txt files also cause this).") from None
    # GECO goal scaling uses the true per-image element count (the
    # reference's 3*H*W assumed 3 channels; input_channels is a flag).
    num_elements = int(np.prod(example_batch["input"].shape[1:]))
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    state = create_train_state(model, cfg, example_batch, rng,
                               num_elements=num_elements)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    fprint(f"Model parameters: {n_params}")

    # Resume
    iter_idx = 0
    if resume_ckpt is not None:
        latest = f"{checkpoint_name}-latest"
        if osp.exists(latest):
            resume_ckpt = latest
        fprint(f"Restoring checkpoint from {resume_ckpt}")
        state = ckpt_lib.restore_checkpoint(resume_ckpt, state)
        iter_idx = int(state.step)
    fprint(f"Starting training at iter = {iter_idx}")

    tp_rules = (model.tp_rules()
                if (mesh.shape.get("model", 1) > 1
                    and hasattr(model, "tp_rules")) else None)
    if tp_rules:
        fprint(f"Tensor parallel: {len(tp_rules)} sharding rules over "
               f"model axis of size {mesh.shape['model']}")
    state = step_lib.shard_state(state, mesh, tp_rules)
    train_step = step_lib.jit_train_step(step_lib.make_train_step(
        model, cfg))
    eval_step = jax.jit(step_lib.make_eval_step(model, cfg))
    vis_fns = make_vis_fns(model)

    # ---- optional device-resident train split ----
    # TPU-native path for splits that fit in HBM: the whole train set is
    # device_put once and each step gathers its batch by index on
    # device, so per-step host->device traffic is a [B] int32 array.
    # (The streaming path overlaps transfers via device_prefetch, but a
    # host-side copy per step remains; this removes it entirely.)
    from genesis_tpu.parallel.mesh import (device_prefetch, data_sharding,
                                           replicated)
    use_devdata = bool(cfg.get("device_dataset", False))
    step_call = train_step
    if use_devdata:
        from genesis_tpu.data.loader import materialize_inputs
        host_buf = materialize_inputs(train_loader)
        if host_buf is None:
            fprint("device_dataset: train split exceeds the HBM budget "
                   "or is empty — using the streaming loader path.")
            use_devdata = False
            # Loaders staged for the device-resident path yield EVERY
            # view of each record (all_frames); streaming that order
            # would produce correlated batches for the whole run. Drop
            # back to random-frame-per-record sampling.
            if getattr(train_loader, "all_frames", False):
                train_loader.set_all_frames(False)
                fprint("device_dataset fallback: loader switched to "
                       "one-random-frame-per-record sampling.")
    if use_devdata:
        n_frames = host_buf.shape[0]
        dev_buf = jax.device_put(host_buf, replicated(mesh))
        del host_buf
        fprint(f"device_dataset: {n_frames} frames "
               f"({dev_buf.nbytes / 1e6:.0f} MB) resident on device")
        batch_sharding = data_sharding(mesh, ndim=dev_buf.ndim)
        raw_step = step_lib.make_train_step(model, cfg)

        @partial(jax.jit, donate_argnums=(0,))
        def _gather_step(state, buf, idx):
            x = jnp.take(buf, idx, axis=0)
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            return raw_step(state, {"input": x})

        step_call = lambda s, idx: _gather_step(s, dev_buf, idx)
        idx_rng = np.random.RandomState(cfg.get("seed", 0) + 1)
        n_per_epoch = n_frames // cfg.batch_size

        def index_stream():
            order = idx_rng.permutation(n_frames).astype(np.int32)
            for s in range(0, n_per_epoch * cfg.batch_size,
                           cfg.batch_size):
                yield order[s:s + cfg.batch_size]

    # ---- hot loop ----
    timer = time.time()
    metrics = None
    vis_batch = example_batch
    grad_probe = None  # built lazily under --log_grads_and_weights
    while iter_idx <= cfg.train_iter:
        if use_devdata:
            device_batches = index_stream()
        else:
            device_batches = device_prefetch(
                ({"input": b["input"]} for b in train_loader), mesh)
        for batch_idx, device_batch in enumerate(device_batches):
            if iter_idx > cfg.train_iter:
                break
            # Optional profiler window (SURVEY.md section 5: jax.profiler
            # trace hooks on top of the reference's wall-clock counters).
            profile_dir = cfg.get("profile_dir", "")
            if profile_dir and iter_idx == 10:
                jax.block_until_ready(metrics)
                jax.profiler.start_trace(profile_dir)
            state, metrics = step_call(state, device_batch)
            if profile_dir and iter_idx == 20:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                fprint(f"Profiler trace written to {profile_dir}")
            iter_idx += 1

            heartbeat = iter_idx % cfg.report_loss_every == 0
            if heartbeat:
                host = {k: np.asarray(v) for k, v in metrics.items()}
                elbo = float(host["elbo"])
                ckpt_lib.save_checkpoint(f"{checkpoint_name}-latest",
                                         state, verbose=False)
                s_per_b = (time.time() - timer) / cfg.report_loss_every
                timer = time.time()
                ps = (f"{cfg.run_name} | [{iter_idx}/{cfg.train_iter:.1e}]"
                      f" elb: {elbo:.0f} err: {float(host['err']):.0f}"
                      f" klm: {float(host['kl_m']):.1f}"
                      f" kll: {float(host['kl_l']):.1f}"
                      f" bet: {float(host['beta']):.1e}"
                      f" - {s_per_b:.3f} s/b"
                      f" ({cfg.batch_size / max(s_per_b, 1e-9):.1f} im/s)")
                fprint(ps, True)
                scalars = {k: v for k, v in host.items() if v.ndim == 0}
                scalars["s_per_batch"] = s_per_b
                if num_elements:
                    scalars["err_element"] = \
                        float(host["err"]) / num_elements
                logger.log_scalars(scalars, "train", iter_idx)
                for key in ("kl_l_k", "kl_m_k"):
                    if key in host:
                        logger.log_scalars(
                            {f"{key}{i}": v for i, v in
                             enumerate(host[key])},
                            "train_steps", iter_idx)

                # Divergence guard (reference train.py:364-368), checked
                # on the heartbeat cadence to avoid per-step host syncs.
                if elbo > ELBO_DIV or not np.isfinite(elbo):
                    ckpt_lib.save_checkpoint(
                        f"{checkpoint_name}-diverged", state)
                    fprint(f"ELBO: {elbo}")
                    fprint(f"ELBO has exceeded {ELBO_DIV} - training has "
                           "diverged.")
                    logger.close()
                    sys.exit(1)

            ckpt_freq = max(int(cfg.train_iter / cfg.num_checkpoints), 1)
            if iter_idx % ckpt_freq == 0:
                ckpt_lib.save_checkpoint(
                    f"{checkpoint_name}-{iter_idx}", state)

            if iter_idx % cfg.run_validation_every == 0:
                # Weight/grad + distribution histograms
                # (reference train.py:313-325, 339-345)
                if cfg.get("log_grads_and_weights", False):
                    # Grads of the live objective on the vis batch,
                    # recomputed by a separate jitted probe on this
                    # cadence only (reference train.py:339-345 logs
                    # param.grad from the last backward per-step; here
                    # the hot step keeps grads fused away).
                    if grad_probe is None:
                        grad_probe = jax.jit(
                            step_lib.make_grad_probe(model, cfg))
                    grads = grad_probe(
                        state, {"input": jnp.asarray(vis_batch["input"])})
                    for tree, prefix in ((state.params, "weights"),
                                         (grads, "grads")):
                        flat = jax.tree_util.tree_flatten_with_path(
                            tree)[0]
                        for path, val in flat:
                            name = "/".join(str(p.key) for p in path
                                            if hasattr(p, "key"))
                            logger.log_histogram(f"{prefix}/{name}",
                                                 np.asarray(val), iter_idx)
                if cfg.get("log_distributions", False):
                    from genesis_tpu.data.loader import prepare_input
                    vis = {"input": prepare_input(
                        jnp.asarray(vis_batch["input"][:8]))}
                    variables = {"params": state.params}
                    if jax.tree_util.tree_leaves(state.batch_stats):
                        variables["batch_stats"] = state.batch_stats
                    _, _, _, att_s, comp_s = model.apply(
                        variables, vis["input"], False,
                        rngs={"sample": jax.random.PRNGKey(iter_idx)})
                    for tag, st in (("att", att_s), ("comp", comp_s)):
                        if st is None:
                            continue
                        for key in ("mu_k", "sigma_k", "pmu_k",
                                    "psigma_k"):
                            if key in st:
                                logger.log_histogram(
                                    f"{tag}_{key}", np.asarray(st[key]),
                                    iter_idx)
                fprint("Running validation...")
                val_stats = evaluation(
                    model, eval_step, state, val_loader, logger, cfg,
                    iter_idx, N_eval=cfg.N_eval)
                fprint(f"VALIDATION STATS: {val_stats}")

            if iter_idx % cfg.log_images_every == 0:
                visualise_outputs(model, state, vis_batch, logger,
                                  "train", iter_idx,
                                  jax.random.PRNGKey(iter_idx),
                                  vis_fns=vis_fns)
                fprint("Logged images to TensorBoard")

    # ---- final eval ----
    fprint("SAVING FINAL MODEL CHECKPOINT...", True)
    ckpt_lib.save_checkpoint(f"{checkpoint_name}-FINAL", state)
    fprint("RUNNING FINAL VALIDATION...", True)
    final_val = evaluation(model, eval_step, state, val_loader, None, cfg,
                           iter_idx, N_eval=cfg.N_eval, N_seg_metrics=300)
    fprint(f"FINAL VALIDATION STATS | {final_val}", True)
    if test_loader is not None:
        fprint("STARTING TESTING...")
        test_stats = evaluation(model, eval_step, state, test_loader, None,
                                cfg, iter_idx, N_eval=cfg.N_eval,
                                N_seg_metrics=300)
        fprint(f"TEST STATS | {test_stats}", True)
        try:
            from genesis_tpu.eval.fid import fid_from_model
            fid_from_model(
                model, state, test_loader,
                batch_size=10 if not cfg.get("debug", False) else 2,
                num_images=(10 if cfg.get("debug", False)
                            else cfg.get("num_fid_images", 10000)),
                img_dir=osp.join("/tmp", run_dir.strip("/")))
        except NotImplementedError:
            fprint("Sampling not implemented for this model.")
        except Exception as e:  # FID is best-effort at end of training
            fprint(f"FID computation failed: {e}")
    logger.close()
    return state
