"""Weighted Procrustes (Kabsch) solver, batched and fully on-device.

Ref parity: modules/registration/procrustes.py:6-91. The reference ships the
3x3 SVD to the CPU (`torch.svd(H.cpu())`); here the batched 3x3 SVD runs
on-device via jnp.linalg.svd — tiny matrices, negligible cost, no
host round-trip.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ref_geotransformer_tpu.ops.se3 import get_transform_from_rotation_translation


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Rigid transform aligning src -> ref by weighted SVD.

    Args:
        src_points: (*, N, 3)
        ref_points: (*, N, 3)
        weights: (*, N) or None. Zero-weight rows (e.g. padded slots) do not
            influence the solution — the static-shape replacement for the
            reference's variable-length chunks.

    Returns:
        (*, 4, 4) transform.
    """
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]  # (*, N, 1)

    src_centroid = jnp.sum(src_points * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=-2, keepdims=True)
    src_centered = src_points - src_centroid
    ref_centered = ref_points - ref_centroid

    h = jnp.einsum("...nc,...nd->...cd", src_centered, w * ref_centered)  # (*, 3, 3)
    u, _, vt = jnp.linalg.svd(h)
    ut = jnp.swapaxes(u, -1, -2)
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", v, ut))
    diag = jnp.ones(src_points.shape[:-2] + (3,), src_points.dtype)
    diag = diag.at[..., 2].set(jnp.sign(det))
    rotation = jnp.einsum("...ij,...j,...jk->...ik", v, diag, ut)

    translation = ref_centroid[..., 0, :] - jnp.einsum("...ij,...j->...i", rotation, src_centroid[..., 0, :])
    return get_transform_from_rotation_translation(rotation, translation)
