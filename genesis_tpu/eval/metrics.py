"""Vectorised segmentation metrics in jnp.

Replaces the reference's per-image sklearn `adjusted_rand_score` loop
(utils/misc.py:101-114) and the per-label double loop of
`average_segcover` (utils/misc.py:173-235) with batched one-hot
contingency-table computations — a single einsum per metric, jittable and
TPU-resident (this is the eval hot spot flagged in SURVEY.md section 3.4).

Semantics match the reference exactly (verified against sklearn and a
numpy port of the reference MSC in tests/test_metrics.py):
  * ARI over argmax masks; `fg_only` restricts to pixels with gt > 0.
  * MSC: per-gt-segment max-IoU over predicted segments, mean over
    present segments + pixel-scaled variant; gt labels < 0 are ignore
    regions; `ignore_background` drops gt label 0.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MAX_GT = 32


def _comb2(x):
    return x * (x - 1.0) / 2.0


def adjusted_rand_index(pred, gt, num_pred: int,
                        num_gt: int = DEFAULT_MAX_GT,
                        fg_only: bool = False):
    """Batched ARI between integer label maps.

    pred: [B, ...] int in [0, num_pred); gt: [B, ...] int (negatives and
    values >= num_gt never occur in practice; num_gt is a static bound).
    Returns ARI per batch element [B]. Degenerate cases (identical trivial
    partitions, empty foreground) return 1.0, matching sklearn.
    """
    bsz = pred.shape[0]
    p = pred.reshape(bsz, -1)
    g = gt.reshape(bsz, -1)
    valid = (g > 0) if fg_only else (g >= 0)
    # Labels beyond the static bound are treated as ignore rather than
    # silently skewing the contingency table (raise num_gt for datasets
    # with large label ids).
    valid = valid & (g < num_gt)
    vf = valid.astype(jnp.float32)
    oh_p = jax.nn.one_hot(p, num_pred, dtype=jnp.float32) * vf[..., None]
    oh_g = jax.nn.one_hot(g, num_gt, dtype=jnp.float32) * vf[..., None]
    cont = jnp.einsum("bni,bnj->bij", oh_p, oh_g)     # [B, P, G]
    a = jnp.sum(cont, axis=2)
    b = jnp.sum(cont, axis=1)
    n = jnp.sum(vf, axis=1)
    comb_n = _comb2(n)
    safe = jnp.maximum(comb_n, 1.0)
    # Normalise by comb(n,2) early for float32 conditioning.
    index = jnp.sum(_comb2(cont), axis=(1, 2)) / safe
    sum_a = jnp.sum(_comb2(a), axis=1) / safe
    sum_b = jnp.sum(_comb2(b), axis=1) / safe
    expected = sum_a * sum_b
    max_index = 0.5 * (sum_a + sum_b)
    denom = max_index - expected
    ari = jnp.where(jnp.abs(denom) > 1e-12,
                    (index - expected) / jnp.where(
                        jnp.abs(denom) > 1e-12, denom, 1.0),
                    1.0)
    # n < 2 (empty / single-pixel foreground): trivial agreement -> 1.0
    return jnp.where(comb_n > 0, ari, 1.0)


def segmentation_covering(gt, pred, num_pred: int,
                          num_gt: int = DEFAULT_MAX_GT,
                          ignore_background: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched segmentation covering of `gt` by `pred`.

    gt: [B, ...] int (labels < 0 = ignore); pred: [B, ...] int in
    [0, num_pred). Returns (mean_sc [B], scaled_sc [B]).
    """
    bsz = gt.shape[0]
    g = gt.reshape(bsz, -1)
    p = pred.reshape(bsz, -1)
    # Out-of-bound labels are ignore regions (see adjusted_rand_index).
    nonignore = ((g >= 0) & (g < num_gt)).astype(jnp.float32)
    oh_g = jax.nn.one_hot(g, num_gt, dtype=jnp.float32) * \
        nonignore[..., None]
    # Pixels in ignore regions are not penalised for the prediction
    # (reference misc.py:210-211).
    oh_p = jax.nn.one_hot(p, num_pred, dtype=jnp.float32) * \
        nonignore[..., None]
    inter = jnp.einsum("bng,bnp->bgp", oh_g, oh_p)    # [B, G, P]
    a = jnp.sum(oh_g, axis=1)                          # [B, G] gt sizes
    b = jnp.sum(oh_p, axis=1)                          # [B, P] pred sizes
    union = a[:, :, None] + b[:, None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    max_iou = jnp.max(iou, axis=2)                     # [B, G]

    label_idx = jnp.arange(num_gt)
    selected = (label_idx >= (1 if ignore_background else 0))
    present = (a > 0) & selected[None, :]
    presentf = present.astype(jnp.float32)
    n_present = jnp.sum(presentf, axis=1)
    mean_sc = jnp.sum(max_iou * presentf, axis=1) / \
        jnp.maximum(n_present, 1.0)
    scaled_num = jnp.sum(a * max_iou * presentf, axis=1)
    scaled_den = jnp.sum(a * presentf, axis=1)
    scaled_sc = scaled_num / jnp.maximum(scaled_den, 1.0)
    return mean_sc, scaled_sc


def masks_to_segmentation(log_m_k):
    """Argmax over the slot axis: [K,B,H,W,1] -> [B,H,W] int32."""
    return jnp.argmax(log_m_k[..., 0], axis=0).astype(jnp.int32)


def dataset_ari(model, state, data_loader, num_images: int = 300,
                seed: int = 0):
    """ARI and FG-ARI over a dataset (reference utils/misc.py:117-159),
    with the per-image sklearn loop replaced by the batched jnp metric.

    Returns (avg_ari, avg_ari_fg, ari_list, ari_fg_list)."""
    import numpy as np
    from genesis_tpu.core.experiment import fprint

    from genesis_tpu.data.loader import prepare_input

    @jax.jit
    def step(state, batch, key):
        batch = dict(batch)
        batch["input"] = prepare_input(batch["input"])
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        _, _, stats, _, _ = model.apply(
            variables, batch["input"], False, rngs={"sample": key})
        gt = batch["instances"]
        if gt.ndim == 4:
            gt = gt[..., 0]
        pred = masks_to_segmentation(stats["log_m_k"])
        num_pred = stats["log_m_k"].shape[0]
        return (adjusted_rand_index(pred, gt, num_pred),
                adjusted_rand_index(pred, gt, num_pred, fg_only=True))

    fprint("Computing ARI on dataset")
    ari, ari_fg = [], []
    key = jax.random.PRNGKey(seed)
    for batch in data_loader:
        if "instances" not in batch:
            return 0.0, 0.0, [0], [0]
        key, sub = jax.random.split(key)
        a, afg = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                      sub)
        ari += np.asarray(a).tolist()
        ari_fg += np.asarray(afg).tolist()
        fprint(f"After [{len(ari)} / {num_images}] images: "
               f"ARI {np.mean(ari):.4f}, FG ARI {np.mean(ari_fg):.4f}")
        if len(ari) >= num_images:
            break
    ari, ari_fg = ari[:num_images], ari_fg[:num_images]
    import numpy as np  # noqa: F811
    fprint(f"FINAL ARI for {len(ari)} images: {np.mean(ari):.4f}")
    fprint(f"FINAL FG ARI for {len(ari_fg)} images: {np.mean(ari_fg):.4f}")
    return float(np.mean(ari)), float(np.mean(ari_fg)), ari, ari_fg
