"""Losses: circle loss (masked), coarse/fine matching losses, overall loss,
and the online evaluator.

Ref parity: modules/loss/circle_loss.py:7-132 (weighted circle loss) and
experiments/geotransformer.3dmatch.../loss.py:10-159 (CoarseMatchingLoss /
FineMatchingLoss / OverallLoss / Evaluator). Boolean indexing is replaced by
masked means; the coarse loss consumes the dense GT overlap map directly
(the reference scatters its sparse list into exactly this matrix,
loss.py:33-35).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.config import CoarseLossConfig, EvalConfig, FineLossConfig, LossWeights
from ref_geotransformer_tpu.ops.metrics import isotropic_transform_error
from ref_geotransformer_tpu.ops.pairwise import pairwise_distance
from ref_geotransformer_tpu.ops.se3 import apply_transform

_BIG = 1e5


def _masked_mean(values, masks):
    w = masks.astype(values.dtype)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


def _safe_sqrt(x):
    """sqrt with zero (not inf) gradient at x == 0.

    Padded coarse nodes all carry identical (zero-input) features, so the
    normalized pairwise distance between two padded slots is EXACTLY 0;
    sqrt'(0) = inf there, and the circle loss's zero weights then produce
    0 * inf = NaN in the gradient — which optax.apply_if_finite silently
    turns into a skipped step, freezing training. Torch never hits this
    because the reference boolean-indexes valid rows before the loss. The
    double-where keeps the primal EXACTLY sqrt(x) (torch-parity-safe) while
    zeroing the pad-pair cotangents."""
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)


def weighted_circle_loss(
    pos_masks: jnp.ndarray,
    neg_masks: jnp.ndarray,
    feat_dists: jnp.ndarray,
    pos_margin: float,
    neg_margin: float,
    pos_optimal: float,
    neg_optimal: float,
    log_scale: float,
    pos_scales: Optional[jnp.ndarray] = None,
    neg_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Margin-based metric-learning loss over a feature-distance matrix
    (circle_loss.py:45-89). pos/neg_masks are boolean; rows/cols with no
    positive or no negative anchor are excluded from the mean."""
    row_masks = jnp.logical_and(jnp.any(pos_masks, axis=-1), jnp.any(neg_masks, axis=-1))
    col_masks = jnp.logical_and(jnp.any(pos_masks, axis=-2), jnp.any(neg_masks, axis=-2))

    pos_weights = feat_dists - _BIG * (1.0 - pos_masks.astype(feat_dists.dtype))
    pos_weights = jnp.maximum(pos_weights - pos_optimal, 0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * pos_scales
    pos_weights = jax.lax.stop_gradient(pos_weights)

    neg_weights = feat_dists + _BIG * (1.0 - neg_masks.astype(feat_dists.dtype))
    neg_weights = jnp.maximum(neg_optimal - neg_weights, 0.0)
    if neg_scales is not None:
        neg_weights = neg_weights * neg_scales
    neg_weights = jax.lax.stop_gradient(neg_weights)

    loss_pos_row = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-1)
    loss_pos_col = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-2)
    loss_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-1)
    loss_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-2)

    loss_row = jax.nn.softplus(loss_pos_row + loss_neg_row) / log_scale
    loss_col = jax.nn.softplus(loss_pos_col + loss_neg_col) / log_scale
    return 0.5 * (_masked_mean(loss_row, row_masks) + _masked_mean(loss_col, col_masks))


def circle_loss(pos_masks, neg_masks, feat_dists, pos_margin, neg_margin, pos_optimal,
                neg_optimal, log_scale):
    """Unweighted variant (circle_loss.py:7-42)."""
    return weighted_circle_loss(
        pos_masks, neg_masks, feat_dists, pos_margin, neg_margin, pos_optimal, neg_optimal, log_scale
    )


def coarse_matching_loss(
    output: Dict,
    cfg: CoarseLossConfig,
) -> jnp.ndarray:
    """Overlap-weighted circle loss over coarse features (loss.py:10-40).

    Uses output['ref_feats_c'] (M, C) / ['src_feats_c'] (N, C) (L2-normalized),
    ['gt_node_overlap_map'] (M, N) dense overlaps, and node validity masks.
    """
    feat_dists = _safe_sqrt(pairwise_distance(output["ref_feats_c"], output["src_feats_c"], normalized=True))
    overlaps = output["gt_node_overlap_map"]
    valid = jnp.logical_and(output["ref_node_masks"][:, None], output["src_node_masks"][None, :])
    pos_masks = jnp.logical_and(overlaps > cfg.positive_overlap, valid)
    neg_masks = jnp.logical_and(overlaps == 0.0, valid)
    if "gt_node_ambiguous_map" in output:
        # intersecting pairs whose overlap was not computed (candidate-cap
        # overflow) must not be trained as negatives
        neg_masks = jnp.logical_and(neg_masks, jnp.logical_not(output["gt_node_ambiguous_map"]))
    pos_scales = jnp.sqrt(overlaps * pos_masks.astype(overlaps.dtype))
    return weighted_circle_loss(
        pos_masks,
        neg_masks,
        feat_dists,
        cfg.positive_margin,
        cfg.negative_margin,
        cfg.positive_optimal,
        cfg.negative_optimal,
        cfg.log_scale,
        pos_scales=pos_scales,
    )


def fine_matching_loss(output: Dict, transform: jnp.ndarray, cfg: FineLossConfig) -> jnp.ndarray:
    """NLL of the GT assignment incl. dustbin rows/cols (loss.py:43-71),
    restricted to valid (training-target) patches via output['node_corr_masks'].
    """
    ref_knn_points = output["ref_node_corr_knn_points"]  # (P, K, 3)
    src_knn_points = output["src_node_corr_knn_points"]
    ref_knn_masks = output["ref_node_corr_knn_masks"]  # (P, K)
    src_knn_masks = output["src_node_corr_knn_masks"]
    matching_scores = output["matching_scores"]  # (P, K+1, K+1) log probs
    patch_masks = output.get("node_corr_masks")  # (P,) or None

    src_knn_points = apply_transform(src_knn_points, transform)
    dists = pairwise_distance(ref_knn_points, src_knn_points)  # (P, K, K)
    gt_masks = jnp.logical_and(ref_knn_masks[:, :, None], src_knn_masks[:, None, :])
    gt_corr_map = jnp.logical_and(dists < cfg.positive_radius**2, gt_masks)
    slack_row = jnp.logical_and(jnp.logical_not(jnp.any(gt_corr_map, axis=2)), ref_knn_masks)
    slack_col = jnp.logical_and(jnp.logical_not(jnp.any(gt_corr_map, axis=1)), src_knn_masks)

    p, k = ref_knn_masks.shape
    labels = jnp.zeros((p, k + 1, k + 1), bool)
    labels = labels.at[:, :k, :k].set(gt_corr_map)
    labels = labels.at[:, :k, k].set(slack_row)
    labels = labels.at[:, k, :k].set(slack_col)
    if patch_masks is not None:
        labels = jnp.logical_and(labels, patch_masks[:, None, None])

    return -_masked_mean(matching_scores, labels)


def overall_loss(
    output: Dict,
    transform: jnp.ndarray,
    coarse_cfg: CoarseLossConfig,
    fine_cfg: FineLossConfig,
    weights: LossWeights,
) -> Dict[str, jnp.ndarray]:
    """Weighted sum (loss.py:74-92)."""
    c_loss = coarse_matching_loss(output, coarse_cfg)
    f_loss = fine_matching_loss(output, transform, fine_cfg)
    loss = weights.weight_coarse_loss * c_loss + weights.weight_fine_loss * f_loss
    return {"loss": loss, "c_loss": c_loss, "f_loss": f_loss}


def evaluate(output: Dict, transform: jnp.ndarray, cfg: EvalConfig) -> Dict[str, jnp.ndarray]:
    """Online metrics: PIR / IR / RRE / RTE / RMSE / RR (loss.py:95-159)."""
    # coarse precision (PIR)
    overlaps = output["gt_node_overlap_map"]
    gt_map = overlaps > cfg.acceptance_overlap
    ref_idx = output["ref_node_corr_indices"]
    src_idx = output["src_node_corr_indices"]
    hits = gt_map[ref_idx, src_idx].astype(jnp.float32)
    pir = jnp.mean(hits)

    # fine inlier ratio (IR) over the predicted correspondence set
    ref_corr = output["ref_corr_points"]
    src_corr = apply_transform(output["src_corr_points"], transform)
    corr_masks = output["corr_masks"]
    dist = jnp.linalg.norm(ref_corr - src_corr, axis=-1)
    ir = _masked_mean((dist < cfg.acceptance_radius).astype(jnp.float32), corr_masks)

    # registration errors
    est = output["estimated_transform"]
    rre, rte = isotropic_transform_error(transform, est)
    realignment = jnp.linalg.inv(transform) @ est
    src_points = output["src_points"]
    src_masks = output["src_point_masks"]
    realigned = apply_transform(src_points, realignment)
    resid = jnp.linalg.norm(realigned - src_points, axis=-1)
    rmse = _masked_mean(resid, src_masks)
    if cfg.recall_criterion == "rre_rte":
        recall = jnp.logical_and(rre < cfg.rre_threshold, rte < cfg.rte_threshold).astype(jnp.float32)
    else:
        recall = (rmse < cfg.rmse_threshold).astype(jnp.float32)

    return {"PIR": pir, "IR": ir, "RRE": rre, "RTE": rte, "RMSE": rmse, "RR": recall}
