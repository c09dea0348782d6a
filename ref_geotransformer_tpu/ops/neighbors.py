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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.ops import selection
from ref_geotransformer_tpu.ops.pairwise import pairwise_distance

_FILL = 1e12


def _chunked_topk_neighbors(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_masks: jnp.ndarray,
    k: int,
    chunk: int,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest supports for each query, invalid supports pushed to _FILL.

    Returns (sq_dists, indices) of shape (M, k), distance-sorted ascending.
    With `approx`, uses lax.approx_min_k (PartialReduce): the TPU-optimized
    partial selection (recall_target 0.95; exact on CPU, where it lowers to a
    full sort) — a missing neighbor at the 95th percentile only perturbs a
    padded neighbor list whose width the reference truncates anyway.
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
        if approx:
            d, idx = selection.min_k(sq, k)
        else:
            neg_top, idx = jax.lax.top_k(-sq, k)  # ascending distance
            d = -neg_top
        return d, idx.astype(jnp.int32)

    dists, indices = jax.lax.map(body, q_chunks)
    dists = dists.reshape(num_chunks * chunk, k)[:m]
    indices = indices.reshape(num_chunks * chunk, k)[:m]
    return dists, indices


def radius_search_brute(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_masks: jnp.ndarray,
    s_masks: jnp.ndarray,
    radius: float,
    limit: int,
    chunk: int = 2048,
    approx: bool = False,
) -> jnp.ndarray:
    """Brute-force radius neighbors (O(M N) distances); `approx` swaps the
    exact top-k for the TPU-optimized approx_min_k selection."""
    n = s_points.shape[0]
    sq_dists, indices = _chunked_topk_neighbors(q_points, s_points, s_masks, limit, chunk, approx)
    valid = sq_dists < radius * radius
    valid = jnp.logical_and(valid, q_masks[:, None])
    return jnp.where(valid, indices, jnp.int32(n))


def radius_search_bucketed(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_masks: jnp.ndarray,
    s_masks: jnp.ndarray,
    radius: float,
    limit: int,
    chunk: int = 2048,
    cell_capacity: Optional[int] = None,
) -> jnp.ndarray:
    """Grid-bucketed radius neighbors — the TPU-shaped spatial acceleration
    replacing the reference's nanoflann KD-tree.

    Supports are sorted by a fused int32 cell key (cell edge == radius, so a
    radius ball is contained in the 27-cell neighborhood). Each query
    gathers up to `cell_capacity` candidates from each of its 27 neighbor
    cells via searchsorted into the sorted keys, computes distances only for
    those O(27 * cell_capacity) candidates, and top-k selects. For clouds at
    voxel resolution ~radius/2.5 this is a 10-50x FLOP reduction vs brute
    force while keeping every shape static.

    Cells holding more than `cell_capacity` supports contribute only their
    first `cell_capacity` points (in key-sorted order) as candidates — size
    the capacity from data statistics like neighbor_limits (default
    2*limit).
    """
    n = s_points.shape[0]
    m = q_points.shape[0]
    c_cap = cell_capacity or max(32, 2 * limit)
    inf = jnp.asarray(jnp.inf, s_points.dtype)

    # bounding grid over valid supports, cell edge == radius
    valid_s = jnp.where(s_masks[:, None], s_points, inf)
    min_corner = jnp.min(valid_s, axis=0)
    max_corner = jnp.max(jnp.where(s_masks[:, None], s_points, -inf), axis=0)
    extent = jnp.maximum(max_corner - min_corner, 0.0)
    nx = (extent[0] / radius).astype(jnp.int32) + 1
    ny = (extent[1] / radius).astype(jnp.int32) + 1
    nz = (extent[2] / radius).astype(jnp.int32) + 1

    def cell_coords(pts):
        return jnp.floor((pts - min_corner) / radius).astype(jnp.int32)

    def fuse(cx, cy, cz, valid, sentinel):
        # distinct sentinels: invalid supports sort last (+MAX); out-of-bounds
        # query cells get -1, which matches no support key
        key = cx + nx * (cy + ny * cz)
        return jnp.where(valid, key, jnp.int32(sentinel))

    s_cells = cell_coords(s_points)
    s_keys = fuse(s_cells[..., 0], s_cells[..., 1], s_cells[..., 2], s_masks, 2**31 - 1)
    order = jnp.argsort(s_keys).astype(jnp.int32)  # stable
    keys_sorted = s_keys[order]
    s_sorted = s_points[order]

    offsets = jnp.array(
        [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)], jnp.int32
    )  # (27, 3)

    chunk = min(chunk, m)
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    q_padded = jnp.pad(q_points, ((0, pad), (0, 0)))
    q_chunks = q_padded.reshape(num_chunks, chunk, 3)

    def body(q):
        qc = cell_coords(q)  # (chunk, 3)
        nc = qc[:, None, :] + offsets[None, :, :]  # (chunk, 27, 3)
        in_bounds = jnp.all(
            jnp.logical_and(nc >= 0, nc < jnp.stack([nx, ny, nz])[None, None, :]), axis=-1
        )
        nkeys = fuse(nc[..., 0], nc[..., 1], nc[..., 2], in_bounds, -1)  # (chunk, 27)

        starts = jnp.searchsorted(keys_sorted, nkeys.reshape(-1), side="left").astype(jnp.int32)
        cand = starts[:, None] + jnp.arange(c_cap, dtype=jnp.int32)[None, :]  # (chunk*27, c)
        cand = jnp.minimum(cand, n - 1)
        cand_keys = keys_sorted[cand]
        cand_ok = cand_keys == nkeys.reshape(-1)[:, None]
        cand = cand.reshape(q.shape[0], 27 * c_cap)
        cand_ok = cand_ok.reshape(q.shape[0], 27 * c_cap)

        cand_pts = s_sorted[cand]  # (chunk, 27c, 3)
        sq = jnp.sum((q[:, None, :] - cand_pts) ** 2, axis=-1)
        sq = jnp.where(cand_ok, sq, _FILL)
        neg_top, pos = jax.lax.top_k(-sq, limit)  # ascending distance
        top_sq = -neg_top
        idx_sorted = jnp.take_along_axis(cand, pos, axis=1)
        idx = order[idx_sorted]
        ok = top_sq < radius * radius
        return jnp.where(ok, idx, jnp.int32(n))

    out = jax.lax.map(body, q_chunks).reshape(num_chunks * chunk, limit)[:m]
    return jnp.where(q_masks[:, None], out, jnp.int32(n))


def radius_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_masks: jnp.ndarray,
    s_masks: jnp.ndarray,
    radius: float,
    limit: int,
    chunk: int = 2048,
    method: str = "approx",
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
        method: 'approx' (brute distances + TPU-optimized approx_min_k
            selection, default — measured 0.99 within-radius distance-profile
            recall at target 0.90 on the real demo cloud, r04 A/B), 'brute'
            (exact O(MN) + exact top-k), or 'bucket' (grid-accelerated
            candidate gathering; loses to the dense methods on TPU, where
            random gathers are slower than MXU-dense distance matmuls).
            A Pallas group-min prefilter variant was built in r03 and
            retired in r04: its VPU distance pass alone (4.75 ms) cost more
            than the whole MXU-based approx path (2.0 ms) and it
            miscomputed on real hardware (DESIGN.md r04).

    Returns:
        (M, limit) int32 neighbor indices into s_points, distance-sorted,
        sentinel == N for empty slots (and for all slots of invalid queries).
    """
    if method == "brute":
        return radius_search_brute(q_points, s_points, q_masks, s_masks, radius, limit, chunk)
    if method == "bucket":
        return radius_search_bucketed(q_points, s_points, q_masks, s_masks, radius, limit, chunk)
    return radius_search_brute(q_points, s_points, q_masks, s_masks, radius, limit, chunk, approx=True)


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
