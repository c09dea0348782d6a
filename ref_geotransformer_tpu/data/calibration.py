"""Static-shape contract calibration.

Two tools replacing (and extending) the reference's neighbor-limit
calibration (utils/data.py:196-221):

  * calibrate_neighbor_limits — histogram of per-level valid-neighbor counts
    over dataset samples; picks the limit covering `keep_ratio` of the mass.
  * calibrate_capacities — max per-level occupied-voxel counts over dataset
    samples (+ headroom), which sizes CapacityConfig.points. The reference
    does not need this (dynamic shapes); the static-shape contract does.

Both run the actual device kernels (grid_subsample / radius_search counts) so
the calibrated numbers match the runtime behavior bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ref_geotransformer_tpu.data.pyramid import pad_points
from ref_geotransformer_tpu.ops.neighbors import _chunked_topk_neighbors
from ref_geotransformer_tpu.ops.subsample import count_voxels, grid_subsample


def _round_up(x: int, m: int = 256) -> int:
    return ((x + m - 1) // m) * m


def calibrate_capacities(
    dataset,
    num_stages: int,
    voxel_size: float,
    num_samples: int = 50,
    headroom: float = 1.1,
    align: int = 256,
) -> Tuple[int, ...]:
    """Max observed per-level point counts over both clouds of sampled pairs."""
    max_counts = [0] * num_stages

    for i in range(min(num_samples, len(dataset))):
        item = dataset[i]
        for side in ("ref_points", "src_points"):
            pts = np.asarray(item[side], np.float32)
            max_counts[0] = max(max_counts[0], pts.shape[0])
            cap = _round_up(pts.shape[0])
            padded, masks = pad_points(pts, cap)
            padded, masks = jnp.array(padded), jnp.array(masks)
            v = voxel_size
            cur_p, cur_m = padded, masks
            for lvl in range(1, num_stages):
                v *= 2.0
                count = int(count_voxels(cur_p, cur_m, v))
                max_counts[lvl] = max(max_counts[lvl], count)
                cur_p, cur_m = grid_subsample(cur_p, cur_m, v, _round_up(count + 8, 64))
    return tuple(_round_up(int(c * headroom), align) for c in max_counts)


def calibrate_neighbor_limits(
    dataset,
    num_stages: int,
    voxel_size: float,
    search_radius: float,
    capacities: Sequence[int],
    keep_ratio: float = 0.8,
    num_samples: int = 20,
    max_limit: int = 128,
) -> Tuple[int, ...]:
    """Per-level neighbor limit covering keep_ratio of the neighbor-count
    histogram (same statistic as the reference's calibration)."""
    hists = np.zeros((num_stages, max_limit + 1), np.int64)

    count_fn = jax.jit(
        lambda q, s, sm, r: jnp.sum(
            jnp.logical_and(_chunked_topk_neighbors(q, s, sm, max_limit, 1024)[0] < r * r, True),
            axis=1,
        ),
        static_argnums=(),
    )

    for i in range(min(num_samples, len(dataset))):
        item = dataset[i]
        for side in ("ref_points", "src_points"):
            pts = np.asarray(item[side], np.float32)[: capacities[0]]
            padded, masks = pad_points(pts, capacities[0])
            padded, masks = jnp.array(padded), jnp.array(masks)
            v, r = voxel_size, search_radius
            cur_p, cur_m = padded, masks
            for lvl in range(num_stages):
                if lvl > 0:
                    v *= 2.0
                    cur_p, cur_m = grid_subsample(cur_p, cur_m, v, capacities[lvl])
                counts = np.asarray(count_fn(cur_p, cur_p, cur_m, r))
                counts = counts[np.asarray(cur_m)]
                hists[lvl] += np.bincount(np.minimum(counts, max_limit), minlength=max_limit + 1)
                r *= 2.0

    limits = []
    for lvl in range(num_stages):
        cum = np.cumsum(hists[lvl])
        total = cum[-1]
        limit = int(np.searchsorted(cum, keep_ratio * total) + 1)
        limits.append(min(limit, max_limit))
    return tuple(limits)
