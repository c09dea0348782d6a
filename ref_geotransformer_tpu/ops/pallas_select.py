"""Pallas TPU prefilter kernel for the pyramid neighbor searches.

The pyramid's hot selection (radius_search over the L0/L1 clouds,
reference extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:3-91) is
PartialReduce-bound: `lax.approx_min_k` fuses the distance compute into its
reduction, but carries (value, index) pairs through every reduce stage at
~90-150G candidates/s (measured, DESIGN.md round 2). This kernel splits the
job:

  stage 1 (Pallas, this file): fused distance + STRIDED group-min.
    Support tile g holds candidates [g*S, (g+1)*S); the running elementwise
    min over tiles leaves, for each lane j, the nearest candidate among
    {g*S + j : g}. Only a running min + a small int tile ride the VPU —
    no index packing, no sort network. Group "collisions" (two true
    neighbors in one lane class) need sorted positions exactly S apart:
    grid-subsampled clouds are spatially key-sorted, so true neighbors sit
    at NEARBY sorted positions and almost never collide (recall measured in
    tools/bench_pyramid_kernel.py).

  stage 2 (existing): `selection.min_k` on the (M, S) reduced matrix —
    G times fewer candidates for the expensive value+index PartialReduce.

The kernel keeps coordinates in a (8, N) transposed layout (xyz rows +
a validity row), computes the (bq, S) distance tile with lane/sublane
broadcasts on the VPU, and accumulates min/arg-tile in VMEM across the
sequential inner grid axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FILL = 1e12


def _prefilter_kernel(q_ref, s_ref, val_ref, arg_ref):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        val_ref[:] = jnp.full_like(val_ref, _FILL)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    sx = s_ref[0:1, :]
    sy = s_ref[1:2, :]
    sz = s_ref[2:3, :]
    invalid = s_ref[3:4, :]  # 0.0 valid, 1.0 invalid

    dx = qx - sx
    dy = qy - sy
    dz = qz - sz
    sq = dx * dx + dy * dy + dz * dz + invalid * _FILL

    cur = val_ref[:]
    better = sq < cur
    val_ref[:] = jnp.where(better, sq, cur)
    arg_ref[:] = jnp.where(better, jnp.int32(g), arg_ref[:])


def group_min_prefilter(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_masks: jnp.ndarray,
    num_groups: int,
    block_q: int = 128,
    interpret: bool = False,
):
    """Strided group-min over support candidates, distance-fused.

    Args:
        q_points: (M, 3) queries (padded rows fine — caller masks).
        s_points: (N, 3) supports.
        s_masks: (N,) bool validity; invalid supports get _FILL distance.
        num_groups: reduction factor G; lane class size S = ceil(N/G)
            (padded with invalid sentinels).
        block_q: query rows per grid step. The two (block_q, S) output
            blocks live double-buffered in VMEM across the sequential G
            axis: 2 * 2 * block_q * S * 4 bytes must stay under the 16 MB
            scoped-VMEM limit (block_q=256 at G=4/N=40960 OOMs on v5e —
            measured, tools/bench_pyramid_kernel.py r04).

    Returns:
        (vals, idx): (M, S) squared distances (_FILL where no valid
        candidate) and (M, S) int32 candidate indices into s_points
        (clamped to N-1 in _FILL slots; callers treat _FILL as empty).
    """
    m = q_points.shape[0]
    n = s_points.shape[0]
    s = -(-n // num_groups)
    # lane-class width must tile the 128-lane registers
    s = -(-s // 128) * 128
    g = -(-n // s)

    # the two (block_q, S) output blocks live multi-buffered in VMEM across
    # the sequential G axis; Mosaic's measured footprint is ~3.3x the raw
    # block bytes (double buffer + revisited-output staging: block_q=128 at
    # S=5120 showed 17.5 MB scoped vs the 16 MB limit — see
    # tools/bench_pyramid_kernel.py r04). Keep block_q * S under 128*2560.
    while block_q > 8 and block_q * s > 128 * 2560:
        block_q //= 2

    mq = -(-m // block_q) * block_q
    q_pad = jnp.pad(q_points.astype(jnp.float32), ((0, mq - m), (0, 125)))
    # transposed support panel: rows xyz + invalid flag, padded cols invalid
    s_t = jnp.zeros((8, g * s), jnp.float32)
    s_t = s_t.at[:3, :n].set(s_points.astype(jnp.float32).T)
    invalid = jnp.ones((g * s,), jnp.float32).at[:n].set(1.0 - s_masks.astype(jnp.float32))
    s_t = s_t.at[3, :].set(invalid)

    grid = (mq // block_q, g)
    vals, args = pl.pallas_call(
        _prefilter_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((8, s), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, s), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, s), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mq, s), jnp.float32),
            jax.ShapeDtypeStruct((mq, s), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_pad, s_t)

    idx = args * s + jnp.arange(s, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(idx, n - 1)
    return vals[:m], idx[:m]


@functools.partial(jax.jit, static_argnames=("k", "num_groups", "block_q", "interpret", "recall"))
def prefiltered_min_k(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_masks: jnp.ndarray,
    k: int,
    num_groups: int = 8,
    block_q: int = 256,
    interpret: bool = False,
    recall: float = 0.95,
):
    """Two-stage top-k nearest supports: Pallas group-min prefilter then
    PartialReduce on the G-times-smaller reduced matrix.

    Returns (sq_dists, indices) of shape (M, k), ascending, _FILL-padded —
    the `_chunked_topk_neighbors` contract (neighbors.py:31-69).
    """
    from ref_geotransformer_tpu.ops import selection

    vals, idx = group_min_prefilter(
        q_points, s_points, s_masks, num_groups, block_q=block_q, interpret=interpret
    )
    d, pos = selection.min_k(vals, k, recall_target=recall)
    return d, jnp.take_along_axis(idx, pos, axis=1)
