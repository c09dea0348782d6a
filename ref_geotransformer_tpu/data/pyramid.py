"""On-device multi-resolution pyramid builder (the stack-mode replacement).

Ref parity: geotransformer/utils/data.py:13-81 (`precompute_data_stack_mode`)
— but where the reference runs voxel subsampling + KD-tree searches on CPU in
DataLoader workers, this version is pure jnp with static shapes: it runs
jitted on the TPU as the first segment of the step function, vmapped over the
two clouds of a pair (and again over pairs for batched training). Level
schedule (matching utils/data.py:23-32):

    level 0: input points (already at the dataset's native resolution)
    level i (1..S-1): grid-subsample of level i-1 at voxel v * 2^i

and per level i: same-level `neighbors` (radius r * 2^i), downsampling table
`subsampling[i]` (queries = level i+1, supports = level i, radius r * 2^i),
and upsampling table `upsampling[i]` (queries = level i, supports = level
i+1, radius r * 2^(i+1)) — utils/data.py:35-73.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ref_geotransformer_tpu.ops.neighbors import radius_search
from ref_geotransformer_tpu.ops.subsample import grid_subsample


def pad_points(points: np.ndarray, capacity: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad an (N, 3) numpy cloud to (capacity, 3) + bool mask (host-side)."""
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"cloud with {n} points exceeds capacity {capacity}")
    padded = np.zeros((capacity, 3), np.float32)
    padded[:n] = points
    masks = np.zeros(capacity, bool)
    masks[:n] = True
    return padded, masks


def build_pyramid(
    points: jnp.ndarray,
    masks: jnp.ndarray,
    num_stages: int,
    voxel_size: float,
    radius: float,
    neighbor_limits: Sequence[int],
    capacities: Sequence[int],
    search_chunk: int = 2048,
) -> Dict[str, Tuple[jnp.ndarray, ...]]:
    """Build the point pyramid + neighbor tables for ONE padded cloud.

    Args:
        points: (capacities[0], 3) padded cloud.
        masks: (capacities[0],) validity.
        num_stages: S.
        voxel_size: level-1 voxel is voxel_size * 2 (reference convention).
        radius: level-0 search radius (init_radius).
        neighbor_limits: per-level static neighbor widths, len S.
        capacities: per-level point capacities, len S.

    Returns dict of tuples (len S / S-1):
        points[i] (C_i, 3), masks[i] (C_i,), neighbors[i] (C_i, nl_i),
        subsampling[i] (C_{i+1}, nl_i), upsampling[i] (C_i, nl_{i+1}),
        all neighbor tables sentinel-filled with len(support).
    """
    assert len(neighbor_limits) == num_stages and len(capacities) == num_stages

    points_list = [points]
    masks_list = [masks]
    v = voxel_size
    for i in range(1, num_stages):
        v *= 2.0
        sub_points, sub_masks = grid_subsample(points_list[-1], masks_list[-1], v, capacities[i])
        points_list.append(sub_points)
        masks_list.append(sub_masks)

    neighbors_list = []
    subsampling_list = []
    upsampling_list = []
    r = radius
    for i in range(num_stages):
        neighbors_list.append(
            radius_search(
                points_list[i], points_list[i], masks_list[i], masks_list[i], r, neighbor_limits[i], search_chunk
            )
        )
        if i < num_stages - 1:
            subsampling_list.append(
                radius_search(
                    points_list[i + 1],
                    points_list[i],
                    masks_list[i + 1],
                    masks_list[i],
                    r,
                    neighbor_limits[i],
                    search_chunk,
                )
            )
            upsampling_list.append(
                radius_search(
                    points_list[i],
                    points_list[i + 1],
                    masks_list[i],
                    masks_list[i + 1],
                    r * 2.0,
                    neighbor_limits[i + 1],
                    search_chunk,
                )
            )
        r *= 2.0

    return {
        "points": tuple(points_list),
        "masks": tuple(masks_list),
        "neighbors": tuple(neighbors_list),
        "subsampling": tuple(subsampling_list),
        "upsampling": tuple(upsampling_list),
    }


def build_registration_inputs(
    ref_points: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_points: jnp.ndarray,
    src_masks: jnp.ndarray,
    num_stages: int,
    voxel_size: float,
    radius: float,
    neighbor_limits: Sequence[int],
    capacities: Sequence[int],
    transform: Optional[jnp.ndarray] = None,
    ref_feats: Optional[jnp.ndarray] = None,
    src_feats: Optional[jnp.ndarray] = None,
    search_chunk: int = 2048,
) -> Dict:
    """Assemble the model input dict for one (ref, src) pair.

    The analogue of registration_collate_fn_stack_mode (utils/data.py:143-193)
    with ref/src kept as separate padded clouds instead of one stacked tensor.
    Default features are all-ones (N, 1), the reference's dataset convention
    (threedmatch/dataset.py:133-134).
    """
    ref = build_pyramid(
        ref_points, ref_masks, num_stages, voxel_size, radius, neighbor_limits, capacities, search_chunk
    )
    src = build_pyramid(
        src_points, src_masks, num_stages, voxel_size, radius, neighbor_limits, capacities, search_chunk
    )
    if ref_feats is None:
        ref_feats = jnp.ones((ref_points.shape[0], 1), jnp.float32)
    if src_feats is None:
        src_feats = jnp.ones((src_points.shape[0], 1), jnp.float32)
    data = {
        "ref": ref,
        "src": src,
        "ref_feats": ref_feats,
        "src_feats": src_feats,
    }
    if transform is not None:
        data["transform"] = transform
    return data
