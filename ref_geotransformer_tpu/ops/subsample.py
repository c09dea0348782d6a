"""Voxel-grid subsampling with static output capacity (jit/vmap-safe).

TPU-native replacement for the reference's CPU C++ extension
(extensions/cpu/grid_subsampling/grid_subsampling_cpu.cpp:3-48): per cloud,
points are hashed to voxels of side `voxel_size` anchored at
floor(min/voxel)*voxel and each occupied voxel emits the centroid of its
points. The C++ version has data-dependent output size; here the output is a
fixed-capacity `(capacity, 3)` buffer plus a validity mask, built from a
lexicographic sort over integer voxel coordinates followed by a segment-mean
— no hash table, no dynamic shapes, fully differentiable-free preprocessing
that XLA pipelines onto the VPU.

Voxel ordering: the C++ unordered_map iteration order is arbitrary; we emit
voxels in lexicographic (z, y, x) order, which is deterministic. Downstream
consumers (neighbor search, KPConv) are order-invariant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def grid_subsample(
    points: jnp.ndarray,
    masks: jnp.ndarray,
    voxel_size: float,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-grid subsample one padded cloud.

    Args:
        points: (N, 3) float32, padded.
        masks: (N,) bool validity mask.
        voxel_size: voxel edge length.
        capacity: static output size. Must be >= the number of occupied
            voxels; surplus voxels beyond capacity are dropped (callers size
            capacity from data statistics, like the reference calibrates
            neighbor limits).

    Returns:
        s_points: (capacity, 3) float32 voxel centroids (zeros in padded slots).
        s_masks: (capacity,) bool validity mask.
    """
    n = points.shape[0]
    inf = jnp.asarray(jnp.inf, points.dtype)
    valid_points = jnp.where(masks[:, None], points, inf)

    # per-cloud origin: floor(min/voxel)*voxel (grid_subsampling_cpu.cpp:9-11)
    min_corner = jnp.min(valid_points, axis=0)
    origin = jnp.floor(min_corner / voxel_size) * voxel_size

    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)  # (N, 3)
    # push invalid points to a sentinel voxel that sorts last
    coords = jnp.where(masks[:, None], coords, _BIG)

    # lexicographic sort by (z, y, x): jnp.lexsort sorts by last key primarily
    order = jnp.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
    coords_sorted = coords[order]
    points_sorted = points[order]
    masks_sorted = masks[order]

    # segment boundaries: first element or any coordinate change
    prev = jnp.roll(coords_sorted, 1, axis=0)
    is_new = jnp.any(coords_sorted != prev, axis=1)
    is_new = is_new.at[0].set(True)
    is_new = jnp.logical_and(is_new, masks_sorted)

    seg_ids = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (N,) in [-1, S)
    seg_ids = jnp.where(masks_sorted, seg_ids, capacity)  # invalid -> overflow bin
    seg_ids = jnp.minimum(seg_ids, capacity)  # voxels beyond capacity -> overflow bin

    weights = masks_sorted.astype(points.dtype)
    sums = jax.ops.segment_sum(
        points_sorted * weights[:, None], seg_ids, num_segments=capacity + 1
    )[:capacity]
    counts = jax.ops.segment_sum(weights, seg_ids, num_segments=capacity + 1)[:capacity]

    s_masks = counts > 0
    s_points = jnp.where(s_masks[:, None], sums / jnp.maximum(counts, 1.0)[:, None], 0.0)
    return s_points, s_masks


def count_voxels(points: jnp.ndarray, masks: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Number of occupied voxels (for capacity calibration tooling)."""
    inf = jnp.asarray(jnp.inf, points.dtype)
    valid_points = jnp.where(masks[:, None], points, inf)
    min_corner = jnp.min(valid_points, axis=0)
    origin = jnp.floor(min_corner / voxel_size) * voxel_size
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    coords = jnp.where(masks[:, None], coords, _BIG)
    order = jnp.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
    coords_sorted = coords[order]
    masks_sorted = masks[order]
    prev = jnp.roll(coords_sorted, 1, axis=0)
    is_new = jnp.any(coords_sorted != prev, axis=1)
    is_new = is_new.at[0].set(True)
    return jnp.sum(jnp.logical_and(is_new, masks_sorted).astype(jnp.int32))
