"""Correspondence extraction / conversion utilities (static-shape).

Ref parity: modules/registration/matching.py:12-228 and :331-443 — score-
matrix extractors (max / threshold / topk / mutual), dense<->node
correspondence conversion, per-patch overlap masks — plus the matching-only
head modules/geotransformer/point_matching.py:5-115 (PointMatching). All
variable-length outputs become fixed-capacity index buffers + masks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.models.registration import compute_correspondence_matrix
from ref_geotransformer_tpu.ops.pairwise import masked_pairwise_distance
from ref_geotransformer_tpu.ops.se3 import apply_transform


def extract_correspondences_from_scores(
    score_mat: jnp.ndarray,
    mutual: bool = False,
    threshold: float = 0.0,
    limit: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row/col-max (optionally mutual) correspondences above a threshold
    (matching.py:12-76), capped at `limit` by score.

    Returns (ref_indices, src_indices, scores, masks), each (limit,).
    """
    m, n = score_mat.shape
    row_best = jnp.argmax(score_mat, axis=1)  # (M,)
    col_best = jnp.argmax(score_mat, axis=0)  # (N,)
    row_scores = jnp.take_along_axis(score_mat, row_best[:, None], axis=1)[:, 0]
    if mutual:
        keep = col_best[row_best] == jnp.arange(m)
    else:
        keep = jnp.ones((m,), bool)
    keep = jnp.logical_and(keep, row_scores > threshold)
    keyed = jnp.where(keep, row_scores, -jnp.inf)
    top_scores, ref_indices = jax.lax.top_k(keyed, min(limit, m))
    src_indices = row_best[ref_indices]
    masks = jnp.isfinite(top_scores)
    pad = limit - ref_indices.shape[0]
    if pad > 0:
        ref_indices = jnp.pad(ref_indices, (0, pad))
        src_indices = jnp.pad(src_indices, (0, pad))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=-jnp.inf)
        masks = jnp.pad(masks, (0, pad))
    return ref_indices.astype(jnp.int32), src_indices.astype(jnp.int32), jnp.where(masks, top_scores, 0.0), masks


def extract_correspondences_topk(
    score_mat: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global top-k cells (matching.py:79-106)."""
    m, n = score_mat.shape
    scores, idx = jax.lax.top_k(score_mat.reshape(-1), k)
    return (idx // n).astype(jnp.int32), (idx % n).astype(jnp.int32), scores


def node_correspondences_to_dense(
    ref_node_corr_indices: jnp.ndarray,
    src_node_corr_indices: jnp.ndarray,
    ref_node_knn_indices: jnp.ndarray,
    src_node_knn_indices: jnp.ndarray,
    ref_node_knn_masks: jnp.ndarray,
    src_node_knn_masks: jnp.ndarray,
    corr_mat: jnp.ndarray,
    score_mat: jnp.ndarray,
    limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Node (patch) correspondences + per-patch assignment matrices -> dense
    point correspondences (matching.py:331-370 role): top-`limit` cells by
    score, returned as fine-point index pairs with masks."""
    p, k, _ = corr_mat.shape
    weights = jnp.where(corr_mat, score_mat, 0.0).reshape(-1)
    scores, flat = jax.lax.top_k(weights, limit)
    b = flat // (k * k)
    r = (flat // k) % k
    s = flat % k
    ref_fine = ref_node_knn_indices[ref_node_corr_indices[b], r]
    src_fine = src_node_knn_indices[src_node_corr_indices[b], s]
    masks = scores > 0.0
    return ref_fine, src_fine, jnp.where(masks, scores, 0.0), masks


def patch_overlap_ratios(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-patch-pair overlap ratios (matching.py:373-443): fraction of each
    side's points with a cross match within pos_radius, for already-paired
    patches (P, K, 3)."""
    src_t = apply_transform(src_knn_points, transform)
    dist2 = masked_pairwise_distance(ref_knn_points, src_t, ref_knn_masks, src_knn_masks)
    match = dist2 < pos_radius**2
    ref_counts = jnp.sum(jnp.any(match, axis=2), axis=1).astype(jnp.float32)
    src_counts = jnp.sum(jnp.any(match, axis=1), axis=1).astype(jnp.float32)
    ref_sizes = jnp.maximum(jnp.sum(ref_knn_masks, axis=1).astype(jnp.float32), 1.0)
    src_sizes = jnp.maximum(jnp.sum(src_knn_masks, axis=1).astype(jnp.float32), 1.0)
    return ref_counts / ref_sizes, src_counts / src_sizes


class PointMatchingResult(NamedTuple):
    ref_corr_points: jnp.ndarray
    src_corr_points: jnp.ndarray
    corr_scores: jnp.ndarray
    corr_masks: jnp.ndarray


def point_matching(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    matching_scores: jnp.ndarray,
    node_corr_scores: jnp.ndarray,
    k: int,
    mutual: bool = True,
    confidence_threshold: float = 0.05,
    use_dustbin: bool = False,
    use_global_score: bool = False,
    correspondence_limit: int = 8192,
) -> PointMatchingResult:
    """Matching-only head (point_matching.py:5-115): same topk/mutual cell
    selection as LGR but no registration solve."""
    if matching_scores.shape[1] == ref_knn_points.shape[1] + 1:
        matching_scores = matching_scores[:, :-1, :-1]
    score_mat = jnp.exp(matching_scores)
    corr_mat = compute_correspondence_matrix(
        score_mat, ref_knn_masks, src_knn_masks, k, mutual, confidence_threshold
    )
    if use_global_score:
        score_mat = score_mat * node_corr_scores[:, None, None]
    score_mat = jnp.where(corr_mat, score_mat, 0.0)

    p, kk, _ = score_mat.shape
    flat = score_mat.reshape(-1)
    c = min(correspondence_limit, flat.shape[0])
    corr_scores, flat_idx = jax.lax.top_k(flat, c)
    corr_masks = corr_scores > 0.0
    b_idx = flat_idx // (kk * kk)
    r_idx = (flat_idx // kk) % kk
    s_idx = flat_idx % kk
    return PointMatchingResult(
        ref_knn_points[b_idx, r_idx],
        src_knn_points[b_idx, s_idx],
        jnp.where(corr_masks, corr_scores, 0.0),
        corr_masks,
    )
