"""GT patch-overlap labels and local-to-global registration, static shapes.

Ref parity:
  * get_node_correspondences — modules/registration/matching.py:231-328. The
    reference returns a variable-length (C, 2) list; here the result is a
    dense (M, N) overlap map (which is exactly how every consumer uses it:
    the coarse loss scatters the list back into a dense matrix,
    experiments/.../loss.py:33-35). Exact overlaps are computed for the
    top-`candidate_limit` enclosing-sphere-intersecting node pairs — the same
    sphere test the reference uses to prune (matching.py:292-302) — ranked by
    intersection margin so the cap only ever drops the least-overlapping
    candidates.
  * LocalGlobalRegistration — modules/geotransformer/
    local_global_registration.py:11-235. torch.nonzero + host-side chunking
    is replaced by (P, K, K) masked weight tensors: per-patch weighted
    Procrustes over all K^2 candidate cells (zero-weight cells do not affect
    the solution), a top-`correspondence_limit` dense verification set, and a
    `lax.scan` refinement loop. Everything, including the SVDs, stays
    on-device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.models.procrustes import weighted_procrustes
from ref_geotransformer_tpu.ops import selection
from ref_geotransformer_tpu.ops.pairwise import pairwise_distance
from ref_geotransformer_tpu.ops.se3 import apply_transform


def get_node_correspondences(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    candidate_limit: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (M, N) ground-truth patch-overlap map + ambiguity mask.

    overlap(i, j) = mean of (fraction of ref patch-i points with a match in
    src patch j, and vice versa), after transforming src by the GT transform;
    a pair of points matches when closer than pos_radius. Exact overlaps are
    computed for the top-`candidate_limit` sphere-intersecting pairs; any
    intersecting pair that did NOT get an exact overlap is returned in the
    ambiguous mask so the coarse loss can exclude it from the negatives
    (the reference evaluates every intersecting pair, matching.py:292-320).
    """
    m = ref_nodes.shape[0]
    n = src_nodes.shape[0]
    k = ref_knn_points.shape[1]

    src_nodes_t = apply_transform(src_nodes, transform)
    src_knn_points_t = apply_transform(src_knn_points, transform)

    # enclosing-sphere radii (matching.py:292-299)
    ref_dists = jnp.linalg.norm(ref_knn_points - ref_nodes[:, None, :], axis=-1)
    ref_dists = jnp.where(ref_knn_masks, ref_dists, 0.0)
    ref_max_dists = jnp.max(ref_dists, axis=1)  # (M,)
    src_dists = jnp.linalg.norm(src_knn_points_t - src_nodes_t[:, None, :], axis=-1)
    src_dists = jnp.where(src_knn_masks, src_dists, 0.0)
    src_max_dists = jnp.max(src_dists, axis=1)  # (N,)

    node_dists = jnp.sqrt(pairwise_distance(ref_nodes, src_nodes_t))  # (M, N)
    margin = ref_max_dists[:, None] + src_max_dists[None, :] + pos_radius - node_dists
    valid_pair = jnp.logical_and(ref_masks[:, None], src_masks[None, :])
    margin = jnp.where(valid_pair, margin, -jnp.inf)

    # top-candidate_limit intersecting pairs by margin (exact selection:
    # these are training labels)
    flat_margin = margin.reshape(-1)
    top_margin, cand = jax.lax.top_k(flat_margin, candidate_limit)
    cand_valid = top_margin > 0.0
    cand_ref = (cand // n).astype(jnp.int32)
    cand_src = (cand % n).astype(jnp.int32)

    ref_pts = ref_knn_points[cand_ref]  # (P, K, 3)
    src_pts = src_knn_points_t[cand_src]  # (P, K, 3)
    ref_m = ref_knn_masks[cand_ref]  # (P, K)
    src_m = src_knn_masks[cand_src]

    dist2 = pairwise_distance(ref_pts, src_pts)  # (P, K, K)
    pair_mask = jnp.logical_and(ref_m[:, :, None], src_m[:, None, :])
    match = jnp.logical_and(dist2 < pos_radius**2, pair_mask)

    ref_overlap_counts = jnp.sum(jnp.any(match, axis=2), axis=1).astype(jnp.float32)  # (P,)
    src_overlap_counts = jnp.sum(jnp.any(match, axis=1), axis=1).astype(jnp.float32)
    ref_sizes = jnp.maximum(jnp.sum(ref_m, axis=1).astype(jnp.float32), 1.0)
    src_sizes = jnp.maximum(jnp.sum(src_m, axis=1).astype(jnp.float32), 1.0)
    overlaps = 0.5 * (ref_overlap_counts / ref_sizes + src_overlap_counts / src_sizes)
    overlaps = jnp.where(cand_valid, overlaps, 0.0)

    overlap_map = jnp.zeros((m, n), ref_nodes.dtype)
    overlap_map = overlap_map.at[cand_ref, cand_src].max(overlaps)

    # intersecting pairs whose exact overlap was NOT computed (capacity
    # overflow): unknown label — neither positive nor negative
    evaluated = jnp.zeros((m, n), bool)
    evaluated = evaluated.at[cand_ref, cand_src].max(cand_valid)
    ambiguous_map = jnp.logical_and(margin > 0.0, jnp.logical_not(evaluated))
    return overlap_map, ambiguous_map


class LGRResult(NamedTuple):
    ref_corr_points: jnp.ndarray  # (C, 3) verification set
    src_corr_points: jnp.ndarray  # (C, 3)
    corr_scores: jnp.ndarray  # (C,) zeros in padded slots
    corr_masks: jnp.ndarray  # (C,) bool
    estimated_transform: jnp.ndarray  # (4, 4)


def compute_correspondence_matrix(
    score_mat: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    k: int,
    mutual: bool,
    confidence_threshold: float,
) -> jnp.ndarray:
    """Top-k mutual selection with confidence threshold
    (local_global_registration.py:49-83). score_mat is in probability space.
    """
    mask_mat = jnp.logical_and(ref_knn_masks[:, :, None], src_knn_masks[:, None, :])

    # ref side: top-k along the src axis
    ref_topk_scores, _ = jax.lax.top_k(score_mat, k)  # (B, K, k)
    ref_thresh = ref_topk_scores[:, :, k - 1 : k]  # kth best per row
    ref_corr = score_mat >= ref_thresh

    src_scores_t = jnp.swapaxes(score_mat, 1, 2)
    src_topk_scores, _ = jax.lax.top_k(src_scores_t, k)
    src_thresh = jnp.swapaxes(src_topk_scores[:, :, k - 1 : k], 1, 2)
    src_corr = score_mat >= src_thresh

    conf = score_mat > confidence_threshold
    ref_corr = jnp.logical_and(ref_corr, conf)
    src_corr = jnp.logical_and(src_corr, conf)
    corr = jnp.logical_and(ref_corr, src_corr) if mutual else jnp.logical_or(ref_corr, src_corr)
    return jnp.logical_and(corr, mask_mat)


def local_to_global_registration(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    matching_scores: jnp.ndarray,
    node_corr_scores: jnp.ndarray,
    k: int,
    acceptance_radius: float,
    mutual: bool = True,
    confidence_threshold: float = 0.05,
    use_dustbin: bool = False,
    use_global_score: bool = False,
    correspondence_threshold: int = 3,
    correspondence_limit: int = 8192,
    num_refinement_steps: int = 5,
) -> LGRResult:
    """RANSAC-free registration from patch-local assignment scores.

    Args:
        ref_knn_points / src_knn_points: (P, K, 3) patch points.
        ref_knn_masks / src_knn_masks: (P, K).
        matching_scores: (P, K+1, K+1) log-assignment from Sinkhorn (with
            dustbin), or (P, K, K) if already stripped.
        node_corr_scores: (P,) patch correspondence scores.
        correspondence_limit: static cap of the dense verification set (the
            reference's optional correspondence_limit; fixed here for static
            shapes).
    """
    has_dustbin = matching_scores.shape[1] == ref_knn_points.shape[1] + 1
    if use_dustbin and has_dustbin:
        # reference semantics (local_global_registration.py:56-84): run the
        # top-k/mutual selection WITH the dustbin row/col present (so a point
        # whose best matches include the dustbin is suppressed), then strip it
        score_full = jnp.exp(matching_scores)
        b = matching_scores.shape[0]
        row_masks_d = jnp.concatenate([ref_knn_masks, jnp.ones((b, 1), bool)], axis=1)
        col_masks_d = jnp.concatenate([src_knn_masks, jnp.ones((b, 1), bool)], axis=1)
        corr_full = compute_correspondence_matrix(
            score_full, row_masks_d, col_masks_d, k, mutual, confidence_threshold
        )
        corr_mat = corr_full[:, :-1, :-1]
        score_mat = score_full[:, :-1, :-1]
    else:
        if has_dustbin:
            matching_scores = matching_scores[:, :-1, :-1]
        score_mat = jnp.exp(matching_scores)  # (P, K, K)
        corr_mat = compute_correspondence_matrix(
            score_mat, ref_knn_masks, src_knn_masks, k, mutual, confidence_threshold
        )
    p, kk, _ = score_mat.shape

    if use_global_score:
        score_mat = score_mat * node_corr_scores[:, None, None]
    score_mat = jnp.where(corr_mat, score_mat, 0.0)  # (P, K, K) weights

    # ---- verification set: global top-C dense correspondences by score
    # (approx selection — the tail of the capped set has near-zero scores) ----
    flat_scores = score_mat.reshape(-1)
    c = min(correspondence_limit, flat_scores.shape[0])
    corr_scores, flat_idx = selection.max_k(flat_scores, c)
    corr_masks = corr_scores > 0.0
    corr_scores = jnp.where(corr_masks, corr_scores, 0.0)
    b_idx = flat_idx // (kk * kk)
    r_idx = (flat_idx // kk) % kk
    s_idx = flat_idx % kk
    ref_corr_points = ref_knn_points[b_idx, r_idx]  # (C, 3)
    src_corr_points = src_knn_points[b_idx, s_idx]

    # ---- local: per-patch weighted Procrustes over all K^2 cells ----
    # weights == 0 cells do not influence the solution, so this equals the
    # reference's per-chunk solve over extracted correspondences.
    ref_cells = jnp.broadcast_to(ref_knn_points[:, :, None, :], (p, kk, kk, 3)).reshape(p, kk * kk, 3)
    src_cells = jnp.broadcast_to(src_knn_points[:, None, :, :], (p, kk, kk, 3)).reshape(p, kk * kk, 3)
    cell_weights = score_mat.reshape(p, kk * kk)
    patch_corr_counts = jnp.sum(corr_mat.reshape(p, kk * kk), axis=1)
    patch_valid = patch_corr_counts >= correspondence_threshold  # (P,)

    batch_transforms = weighted_procrustes(src_cells, ref_cells, cell_weights)  # (P, 4, 4)

    # count inliers of each local transform over the verification set
    aligned = apply_transform(src_corr_points[None, :, :], batch_transforms)  # (P, C, 3)
    residuals = jnp.linalg.norm(ref_corr_points[None, :, :] - aligned, axis=-1)
    inlier = jnp.logical_and(residuals < acceptance_radius, corr_masks[None, :])
    inlier_counts = jnp.sum(inlier.astype(jnp.int32), axis=1)
    inlier_counts = jnp.where(patch_valid, inlier_counts, -1)
    best = jnp.argmax(inlier_counts)

    any_valid = jnp.any(patch_valid)
    # degenerate fallback (reference :179-185): fit on the whole verification
    # set, then keep inliers of that fit.
    fallback_transform = weighted_procrustes(src_corr_points, ref_corr_points, corr_scores)
    fb_aligned = apply_transform(src_corr_points, fallback_transform)
    fb_inlier = jnp.linalg.norm(ref_corr_points - fb_aligned, axis=-1) < acceptance_radius

    start_inlier = jnp.where(any_valid, inlier[best], fb_inlier)
    cur_corr_scores = corr_scores * start_inlier.astype(corr_scores.dtype)

    # ---- global refinement (reference :186-192) ----
    def refine(carry, _):
        scores_i = carry
        transform_i = weighted_procrustes(src_corr_points, ref_corr_points, scores_i)
        aligned_i = apply_transform(src_corr_points, transform_i)
        resid_i = jnp.linalg.norm(ref_corr_points - aligned_i, axis=-1)
        new_scores = corr_scores * (resid_i < acceptance_radius).astype(corr_scores.dtype)
        return new_scores, transform_i

    _, transforms = jax.lax.scan(refine, cur_corr_scores, None, length=num_refinement_steps)
    estimated_transform = transforms[-1]

    return LGRResult(ref_corr_points, src_corr_points, corr_scores, corr_masks, estimated_transform)
