"""Vectorised ARI/MSC vs sklearn and a numpy port of the reference MSC."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from genesis_tpu.eval import metrics as M

RS = np.random.RandomState(7)


def _random_seg(B, H, W, k):
    return RS.randint(0, k, size=(B, H, W)).astype(np.int32)


@pytest.mark.quick
@pytest.mark.parametrize("fg_only", [False, True])
def test_ari_matches_sklearn(fg_only):
    B, H, W = 4, 8, 8
    pred = _random_seg(B, H, W, 5)
    gt = _random_seg(B, H, W, 4)
    ours = np.asarray(M.adjusted_rand_index(
        jnp.asarray(pred), jnp.asarray(gt), num_pred=5, num_gt=8,
        fg_only=fg_only))
    for b in range(B):
        p = pred[b].flatten()
        g = gt[b].flatten()
        if fg_only:
            p, g = p[g > 0], g[g > 0]
        oracle = adjusted_rand_score(g, p)
        np.testing.assert_allclose(ours[b], oracle, atol=1e-4)


def test_ari_perfect_and_degenerate():
    # Identical labelings -> 1.0
    seg = _random_seg(2, 6, 6, 3)
    ari = np.asarray(M.adjusted_rand_index(
        jnp.asarray(seg), jnp.asarray(seg), num_pred=3, num_gt=4))
    np.testing.assert_allclose(ari, 1.0, atol=1e-5)
    # Empty foreground (all gt zero) with fg_only -> 1.0 like sklearn
    gt0 = np.zeros((2, 6, 6), np.int32)
    ari_fg = np.asarray(M.adjusted_rand_index(
        jnp.asarray(seg), jnp.asarray(gt0), num_pred=3, num_gt=4,
        fg_only=True))
    np.testing.assert_allclose(ari_fg, 1.0, atol=1e-5)


def _reference_msc_numpy(segA, segB, ignore_background=False):
    """Numpy port of the reference average_segcover law
    (utils/misc.py:173-235): per-gt-label max IoU over pred labels,
    mean over present labels + pixel-scaled variant."""
    bsz = segA.shape[0]
    nonignore = segA >= 0
    mean_scores = np.zeros(bsz)
    N = np.zeros(bsz, np.int64)
    scaled_scores = np.zeros(bsz)
    scaling_sum = np.zeros(bsz, np.int64)
    if ignore_background:
        iter_A = np.unique(segA[segA > 0])
    else:
        iter_A = np.unique(segA[segA >= 0])
    iter_B = np.unique(segB[segB >= 0])
    for i in iter_A:
        binA = segA == i
        if not binA.any():
            continue
        max_iou = np.zeros(bsz)
        for j in iter_B:
            binB = (segB == j) & nonignore
            if not binB.any():
                continue
            inter = (binA & binB).sum((1, 2))
            union = (binA | binB).sum((1, 2))
            iou = np.where(union == 0, -100.0, inter / np.maximum(union, 1))
            max_iou = np.where(iou > max_iou, iou, max_iou)
        mean_scores += max_iou
        N = np.where(binA.sum((1, 2)) > 0, N + 1, N)
        scaled_scores += binA.sum((1, 2)) * max_iou
        scaling_sum += binA.sum((1, 2))
    mean_sc = mean_scores / np.maximum(N, 1)
    scaled_sc = scaled_scores / np.maximum(scaling_sum, 1)
    return mean_sc, scaled_sc


@pytest.mark.quick
@pytest.mark.parametrize("ignore_background", [False, True])
def test_msc_matches_reference_law(ignore_background):
    B, H, W = 3, 10, 10
    gt = _random_seg(B, H, W, 4)
    # Add an ignore region
    gt[0, :2, :2] = -1
    pred = _random_seg(B, H, W, 6)
    ours_mean, ours_scaled = M.segmentation_covering(
        jnp.asarray(gt), jnp.asarray(pred), num_pred=6, num_gt=8,
        ignore_background=ignore_background)
    ref_mean, ref_scaled = _reference_msc_numpy(
        gt, pred, ignore_background)
    np.testing.assert_allclose(np.asarray(ours_mean), ref_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_scaled), ref_scaled,
                               atol=1e-5)


def test_msc_perfect_cover():
    gt = _random_seg(2, 8, 8, 3)
    mean_sc, scaled_sc = M.segmentation_covering(
        jnp.asarray(gt), jnp.asarray(gt), num_pred=3, num_gt=4)
    np.testing.assert_allclose(np.asarray(mean_sc), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scaled_sc), 1.0, atol=1e-6)


def test_masks_to_segmentation():
    log_m = jnp.log(jnp.asarray(
        [[[[[0.7]], [[0.2]]]], [[[[0.3]], [[0.8]]]]]))  # [2,1,2,1,1]
    seg = M.masks_to_segmentation(log_m)
    assert seg.shape == (1, 2, 1)
    np.testing.assert_array_equal(np.asarray(seg), [[[0], [1]]])


def _deepmind_ari(true_ids, pred_ids, n_true, n_pred):
    """Numpy oracle of the DeepMind batched one-hot ARI
    (third_party/multi_object_datasets/segmentation_metrics.py:20-92):
    contingency N = true^T pred, rindex/aindex/bindex from sum n*(n-1),
    ARI = (rindex - expected) / (max - expected)."""
    B, n_points = true_ids.shape
    oh_t = np.eye(n_true)[true_ids]               # [B, n, T]
    oh_p = np.eye(n_pred)[pred_ids]               # [B, n, P]
    N = np.einsum("bji,bjk->bik", oh_t, oh_p)     # [B, T, P]
    a = N.sum(axis=2)
    b = N.sum(axis=1)
    rindex = (N * (N - 1)).sum(axis=(1, 2))
    aindex = (a * (a - 1)).sum(axis=1)
    bindex = (b * (b - 1)).sum(axis=1)
    expected = aindex * bindex / (n_points * (n_points - 1))
    max_r = 0.5 * (aindex + bindex)
    return (rindex - expected) / (max_r - expected)


def test_ari_matches_deepmind_onehot_formulation():
    """Golden test vs the DeepMind TF ARI law (the one-hot contingency
    formulation our einsum metric re-derives)."""
    B, H, W = 6, 8, 8
    gt = _random_seg(B, H, W, 4)
    pred = _random_seg(B, H, W, 5)
    ours = np.asarray(M.adjusted_rand_index(jnp.asarray(pred),
                                            jnp.asarray(gt), 5))
    oracle = _deepmind_ari(gt.reshape(B, -1), pred.reshape(B, -1), 4, 5)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_ari_fg_matches_deepmind_with_bg_excluded():
    """FG-only ARI == DeepMind ARI computed over foreground points only
    (the reference's ARI-FG protocol, utils/misc.py:108-110)."""
    B, H, W = 4, 8, 8
    gt = _random_seg(B, H, W, 4)
    gt[:, :2, :] = 0  # guaranteed background region
    pred = _random_seg(B, H, W, 5)
    ours = np.asarray(M.adjusted_rand_index(
        jnp.asarray(pred), jnp.asarray(gt), 5, fg_only=True))
    # Per-element oracle on the fg point subset (variable length ->
    # loop, which is exactly what the vectorised metric avoids).
    for i in range(B):
        fg = gt[i].reshape(-1) > 0
        if fg.sum() < 2:
            continue
        o = _deepmind_ari(gt[i].reshape(1, -1)[:, fg],
                          pred[i].reshape(1, -1)[:, fg], 4, 5)[0]
        np.testing.assert_allclose(ours[i], o, rtol=1e-5, atol=1e-6)
