"""Fixed-width neighbor search on device (radius + kNN), jit/vmap-safe.

TPU-native replacement for the reference's nanoflann KD-tree extension
(extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:3-91 +
modules/ops/radius_search.py:7-27): for each query, return the `limit`
nearest support points within `radius`, sorted by ascending distance, with
the sentinel index == len(support) for empty slots. The reference pads to the
batch-max count then truncates to a calibrated `neighbor_limit`; here `limit`
is the static column width directly.

Implementation: chunked brute-force masked distances + top-k. The distance
matrix is evaluated in query chunks under `lax.map` so peak memory stays
O(chunk * N) regardless of cloud size; the inner product rides the MXU and
the top-k keeps rows distance-sorted (required by nearest_upsample,
kpconv/functional.py:6-22).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.ops.pairwise import pairwise_distance

_FILL = 1e12


def _chunked_topk_neighbors(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_masks: jnp.ndarray,
    k: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest supports for each query, invalid supports pushed to _FILL.

    Returns (sq_dists, indices) of shape (M, k), distance-sorted ascending.
    """
    m = q_points.shape[0]
    chunk = min(chunk, m)
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    q_padded = jnp.pad(q_points, ((0, pad), (0, 0)))
    q_chunks = q_padded.reshape(num_chunks, chunk, 3)

    s_invalid = jnp.logical_not(s_masks)

    def body(q):
        sq = pairwise_distance(q, s_points)  # (chunk, N)
        sq = jnp.where(s_invalid[None, :], _FILL, sq)
        neg_top, idx = jax.lax.top_k(-sq, k)  # ascending distance
        return -neg_top, idx.astype(jnp.int32)

    dists, indices = jax.lax.map(body, q_chunks)
    dists = dists.reshape(num_chunks * chunk, k)[:m]
    indices = indices.reshape(num_chunks * chunk, k)[:m]
    return dists, indices


def radius_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_masks: jnp.ndarray,
    s_masks: jnp.ndarray,
    radius: float,
    limit: int,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Radius neighbors with static width.

    Args:
        q_points: (M, 3) padded queries.
        s_points: (N, 3) padded supports.
        q_masks: (M,) query validity.
        s_masks: (N,) support validity.
        radius: search radius.
        limit: static number of neighbor slots (the calibrated neighbor_limit).
        chunk: query rows per inner step (memory knob).

    Returns:
        (M, limit) int32 neighbor indices into s_points, distance-sorted,
        sentinel == N for empty slots (and for all slots of invalid queries).
    """
    n = s_points.shape[0]
    sq_dists, indices = _chunked_topk_neighbors(q_points, s_points, s_masks, limit, chunk)
    valid = sq_dists < radius * radius
    valid = jnp.logical_and(valid, q_masks[:, None])
    return jnp.where(valid, indices, jnp.int32(n))


def knn_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_masks: jnp.ndarray,
    s_masks: jnp.ndarray,
    k: int,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest valid supports per query.

    Returns:
        indices: (M, k) int32, sentinel == N where fewer than k valid supports
            exist or the query is invalid.
        sq_dists: (M, k) squared distances (_FILL in sentinel slots).
    """
    n = s_points.shape[0]
    sq_dists, indices = _chunked_topk_neighbors(q_points, s_points, s_masks, k, chunk)
    valid = sq_dists < _FILL
    valid = jnp.logical_and(valid, q_masks[:, None])
    indices = jnp.where(valid, indices, jnp.int32(n))
    return indices, sq_dists
