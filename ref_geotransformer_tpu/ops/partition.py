"""Point-to-node patch partitioning with static shapes.

Ref parity: modules/ops/pointcloud_partition.py:9-175. The reference's
`point_to_node_partition` (":60-107", the fixed variant) assigns each point
to its nearest node, then builds per-node patches as the top-`point_limit`
nearest points *owned by the node*; non-owned slots are filled with the
sentinel index == N. All of that maps directly to masked dense ops here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.ops import selection
from ref_geotransformer_tpu.ops.pairwise import masked_pairwise_distance

_FILL = 1e12


def get_point_to_node_indices(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_masks: jnp.ndarray,
    node_masks: jnp.ndarray,
    return_counts: bool = False,
):
    """Nearest-node index for every point; invalid points map to num_nodes.

    Ref parity: pointcloud_partition.py:9-31.
    """
    m = nodes.shape[0]
    sq = masked_pairwise_distance(points, nodes, point_masks, node_masks)  # (N, M)
    indices = jnp.argmin(sq, axis=1).astype(jnp.int32)
    indices = jnp.where(point_masks, indices, jnp.int32(m))
    if return_counts:
        one_hot = (indices[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(jnp.int32)
        node_sizes = jnp.sum(one_hot, axis=0)
        return indices, node_sizes
    return indices


def point_to_node_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_limit: int,
    point_masks: jnp.ndarray,
    node_masks: jnp.ndarray,
    return_count: bool = False,
):
    """Static-shape patch builder (pointcloud_partition.py:60-107 parity).

    Args:
        points: (N, 3) padded fine points.
        nodes: (M, 3) padded superpoints.
        point_limit: K, patch capacity.
        point_masks: (N,) validity.
        node_masks: (M,) validity.

    Returns:
        point_to_node: (N,) int32 owning node per point (M for invalid points).
        occupied_node_masks: (M,) bool — valid node that owns >= 1 point.
        node_knn_indices: (M, K) int32, sentinel == N for empty slots.
        node_knn_masks: (M, K) bool.
        [node_sizes: (M,) int32 if return_count]
    """
    n = points.shape[0]
    m = nodes.shape[0]

    sq = masked_pairwise_distance(nodes, points, node_masks, point_masks)  # (M, N)

    point_to_node = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (N,)
    point_to_node = jnp.where(point_masks, point_to_node, jnp.int32(m))

    ownership = point_to_node[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None]  # (M, N)
    occupied_node_masks = jnp.any(ownership, axis=1)

    owned_sq = jnp.where(ownership, sq, _FILL)
    # TPU PartialReduce selection (exact on CPU); at worst it swaps the
    # patch's farthest member — the reference truncates patches to the K
    # nearest owned points anyway (pointcloud_partition.py:95-99)
    top_sq, node_knn_indices = selection.min_k(owned_sq, point_limit)
    node_knn_masks = top_sq < _FILL
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices.astype(jnp.int32), jnp.int32(n))

    if return_count:
        node_sizes = jnp.sum(ownership.astype(jnp.int32), axis=1)
        return point_to_node, node_sizes, occupied_node_masks, node_knn_indices, node_knn_masks
    return point_to_node, occupied_node_masks, node_knn_indices, node_knn_masks


def knn_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    k: int,
    point_masks: jnp.ndarray,
    node_masks: jnp.ndarray,
    return_distance: bool = False,
):
    """k nearest points per node (pointcloud_partition.py:34-57 parity)."""
    n = points.shape[0]
    sq = masked_pairwise_distance(nodes, points, node_masks, point_masks)  # (M, N)
    neg_top, knn_indices = jax.lax.top_k(-sq, k)
    knn_sq = -neg_top
    knn_masks = knn_sq < _FILL
    knn_indices = jnp.where(knn_masks, knn_indices.astype(jnp.int32), jnp.int32(n))
    if return_distance:
        return jnp.sqrt(jnp.where(knn_masks, knn_sq, 0.0)), knn_indices, knn_masks
    return knn_indices, knn_masks


def ball_query_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    radius: float,
    point_limit: int,
    point_masks: jnp.ndarray,
    node_masks: jnp.ndarray,
    return_count: bool = False,
):
    """Radius-ball variant (pointcloud_partition.py:158-175 parity)."""
    n = points.shape[0]
    knn_distances, knn_indices, knn_masks = knn_partition(
        points, nodes, point_limit, point_masks, node_masks, return_distance=True
    )
    in_ball = jnp.logical_and(knn_masks, knn_distances < radius)
    knn_indices = jnp.where(in_ball, knn_indices, jnp.int32(n))
    if return_count:
        node_sizes = jnp.sum(in_ball.astype(jnp.int32), axis=1)
        return knn_indices, in_ball, node_sizes
    return knn_indices, in_ball
