"""Registration metrics (pure jnp, mask-aware).

Ref parity: modules/registration/metrics.py:8-162 and
utils/registration.py:17-155 (numpy variants). All functions accept optional
validity masks so they operate on padded clouds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ref_geotransformer_tpu.ops.pairwise import masked_pairwise_distance
from ref_geotransformer_tpu.ops.se3 import (
    apply_transform,
    get_rotation_translation_from_transform,
)


def _masked_mean(values: jnp.ndarray, masks: Optional[jnp.ndarray], axis=None) -> jnp.ndarray:
    if masks is None:
        return jnp.mean(values, axis=axis)
    w = masks.astype(values.dtype)
    return jnp.sum(values * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1.0)


def relative_rotation_error(gt_rotation: jnp.ndarray, est_rotation: jnp.ndarray) -> jnp.ndarray:
    """RRE in degrees: arccos((trace(R_gt^T R_est) - 1) / 2) (metrics.py:47-65)."""
    mat = jnp.einsum("...ji,...jk->...ik", gt_rotation, est_rotation)
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    x = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(x))


def relative_translation_error(gt_translation: jnp.ndarray, est_translation: jnp.ndarray) -> jnp.ndarray:
    """RTE: euclidean distance between translations (metrics.py:68-81)."""
    return jnp.linalg.norm(gt_translation - est_translation, axis=-1)


def isotropic_transform_error(
    gt_transforms: jnp.ndarray, transforms: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(RRE, RTE) between (*, 4, 4) transforms (metrics.py:84-111)."""
    gt_rotations, gt_translations = get_rotation_translation_from_transform(gt_transforms)
    rotations, translations = get_rotation_translation_from_transform(transforms)
    rre = relative_rotation_error(gt_rotations, rotations)
    rte = relative_translation_error(gt_translations, translations)
    return rre, rte


def anisotropic_transform_error(
    gt_transforms: jnp.ndarray, transforms: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-axis rotation (Euler xyz, degrees) and translation errors.

    Ref parity: metrics.py:114-162 (which round-trips through numpy/scipy
    Euler angles); here computed with a closed-form xyz Euler extraction.
    Returns (r_mse, r_mae, t_mse, t_mae).
    """

    def euler_xyz(rot):
        # R = Rz @ Ry @ Rx convention matching scipy's 'xyz' extrinsic order
        sy = -rot[..., 2, 0]
        sy = jnp.clip(sy, -1.0, 1.0)
        y = jnp.arcsin(sy)
        x = jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2])
        z = jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])
        return jnp.degrees(jnp.stack([x, y, z], axis=-1))

    gt_rotations, gt_translations = get_rotation_translation_from_transform(gt_transforms)
    rotations, translations = get_rotation_translation_from_transform(transforms)
    r_err = euler_xyz(gt_rotations) - euler_xyz(rotations)
    t_err = gt_translations - translations
    r_mse = jnp.mean(r_err**2, axis=-1)
    r_mae = jnp.mean(jnp.abs(r_err), axis=-1)
    t_mse = jnp.mean(t_err**2, axis=-1)
    t_mae = jnp.mean(jnp.abs(t_err), axis=-1)
    return r_mse, r_mae, t_mse, t_mae


def modified_chamfer_distance(
    raw_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    src_points: jnp.ndarray,
    gt_transform: jnp.ndarray,
    transform: jnp.ndarray,
    raw_masks: Optional[jnp.ndarray] = None,
    ref_masks: Optional[jnp.ndarray] = None,
    src_masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Modified chamfer distance (metrics.py:8-44): both directions measured
    against the raw (complete) cloud."""
    aligned_src = apply_transform(src_points, transform)
    sq_p = masked_pairwise_distance(aligned_src, raw_points, src_masks, raw_masks)
    chamfer_p = _masked_mean(jnp.min(sq_p, axis=-1), src_masks)

    composed = transform @ jnp.linalg.inv(gt_transform)
    aligned_raw = apply_transform(raw_points, composed)
    sq_q = masked_pairwise_distance(ref_points, aligned_raw, ref_masks, raw_masks)
    chamfer_q = _masked_mean(jnp.min(sq_q, axis=-1), ref_masks)
    return chamfer_p + chamfer_q


def inlier_ratio(
    ref_corr_points: jnp.ndarray,
    src_corr_points: jnp.ndarray,
    transform: jnp.ndarray,
    positive_radius: float = 0.1,
    corr_masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fraction of correspondences within positive_radius after alignment
    (utils/registration.py:141-146)."""
    aligned = apply_transform(src_corr_points, transform)
    residuals = jnp.linalg.norm(ref_corr_points - aligned, axis=-1)
    return _masked_mean((residuals < positive_radius).astype(jnp.float32), corr_masks)


def overlap_ratio(
    ref_points: jnp.ndarray,
    src_points: jnp.ndarray,
    transform: jnp.ndarray,
    positive_radius: float = 0.1,
    ref_masks: Optional[jnp.ndarray] = None,
    src_masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fraction of ref points with a src neighbor within radius after alignment
    (utils/registration.py:149-155)."""
    aligned = apply_transform(src_points, transform)
    sq = masked_pairwise_distance(ref_points, aligned, ref_masks, src_masks)
    nn = jnp.min(sq, axis=-1)
    return _masked_mean((nn < positive_radius**2).astype(jnp.float32), ref_masks)


def registration_rmse(
    src_points: jnp.ndarray,
    gt_transform: jnp.ndarray,
    transform: jnp.ndarray,
    src_masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean realignment residual over src points, the acceptance statistic for
    registration recall (experiment loss.py:147-159 evaluate_registration)."""
    realignment = jnp.linalg.inv(gt_transform) @ transform
    realigned = apply_transform(src_points, realignment)
    residuals = jnp.linalg.norm(realigned - src_points, axis=-1)
    return _masked_mean(residuals, src_masks)
