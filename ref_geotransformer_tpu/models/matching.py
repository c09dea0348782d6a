"""Superpoint (coarse) matching: proposal selection and training targets.

Ref parity: modules/geotransformer/superpoint_matching.py:7-51 and
superpoint_target.py:6-41 — reformulated without `torch.nonzero`: instead of
physically removing empty nodes, invalid rows/cols are zeroed out of the
dual-normalization sums and excluded from the global top-k, which is exactly
equivalent and keeps shapes static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.ops.pairwise import pairwise_distance


def superpoint_matching(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    num_correspondences: int,
    dual_normalization: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select top-k superpoint correspondences by dual-normalized Gaussian
    feature similarity.

    Args:
        ref_feats: (M, C) L2-normalized coarse features.
        src_feats: (N, C).
        ref_masks / src_masks: validity (False = empty/padded node).
        num_correspondences: static k.

    Returns:
        ref_corr_indices, src_corr_indices: (k,) int32.
        corr_scores: (k,) — padded proposals get score 0 (cannot happen in
            practice since k << M*N of valid pairs).
    """
    valid = jnp.logical_and(ref_masks[:, None], src_masks[None, :])  # (M, N)
    scores = jnp.exp(-pairwise_distance(ref_feats, src_feats, normalized=True))
    scores = jnp.where(valid, scores, 0.0)
    if dual_normalization:
        ref_norm = scores / jnp.maximum(jnp.sum(scores, axis=1, keepdims=True), 1e-12)
        src_norm = scores / jnp.maximum(jnp.sum(scores, axis=0, keepdims=True), 1e-12)
        scores = ref_norm * src_norm
        scores = jnp.where(valid, scores, 0.0)

    n = scores.shape[1]
    flat = scores.reshape(-1)
    corr_scores, corr_indices = jax.lax.top_k(flat, num_correspondences)
    ref_corr_indices = (corr_indices // n).astype(jnp.int32)
    src_corr_indices = (corr_indices % n).astype(jnp.int32)
    return ref_corr_indices, src_corr_indices, corr_scores


def superpoint_target_sample(
    rng: jax.Array,
    gt_overlap_map: jnp.ndarray,
    num_targets: int,
    overlap_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Randomly sample up to `num_targets` GT node correspondences with
    overlap above threshold (superpoint_target.py:27-41), from the dense
    (M, N) overlap map.

    Random selection without replacement == top-k of uniform keys over the
    eligible set. When fewer than num_targets are eligible, the surplus slots
    are marked invalid in the returned mask.

    Returns:
        ref_indices, src_indices: (num_targets,) int32
        overlaps: (num_targets,)
        valid: (num_targets,) bool
    """
    m, n = gt_overlap_map.shape
    eligible = gt_overlap_map > overlap_threshold
    keys = jax.random.uniform(rng, (m * n,))
    keys = jnp.where(eligible.reshape(-1), keys, -1.0)
    top_keys, indices = jax.lax.top_k(keys, num_targets)
    valid = top_keys >= 0.0
    ref_indices = (indices // n).astype(jnp.int32)
    src_indices = (indices % n).astype(jnp.int32)
    overlaps = gt_overlap_map.reshape(-1)[indices]
    return ref_indices, src_indices, jnp.where(valid, overlaps, 0.0), valid
