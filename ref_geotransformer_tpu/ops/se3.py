"""SE(3) rigid-transform utilities (pure jnp, batch-polymorphic).

Functional parity targets: /root/reference/geotransformer/modules/ops/
transformation.py:7-253 (apply_transform, compose/decompose/inverse,
skew_symmetric_matrix, rodrigues_rotation_matrix, rodrigues_alignment_matrix).
Everything here is shape-polymorphic over leading batch dims and safe under
jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to points.

    Supports:
      - points (*, N, 3) or (N, 3), transform (4, 4): one transform for all.
      - points (B, N, 3), transform (B, 4, 4): batched.

    Ref parity: transformation.py:7-56.
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    if transform.ndim == 2:
        # single transform, arbitrary point batch shape
        return points @ rotation.T + translation
    # batched: transform (B, 4, 4) with points (B, N, 3)
    return jnp.einsum("...ij,...nj->...ni", rotation, points) + translation[..., None, :]


def apply_rotation(points: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """Apply a rotation matrix to points (same batching rules as apply_transform)."""
    if rotation.ndim == 2:
        return points @ rotation.T
    return jnp.einsum("...ij,...nj->...ni", rotation, points)


def get_transform_from_rotation_translation(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Build a (*, 4, 4) transform from (*, 3, 3) rotation and (*, 3) translation."""
    batch_shape = rotation.shape[:-2]
    transform = jnp.zeros(batch_shape + (4, 4), dtype=rotation.dtype)
    transform = transform.at[..., :3, :3].set(rotation)
    transform = transform.at[..., :3, 3].set(translation)
    transform = transform.at[..., 3, 3].set(1.0)
    return transform


def get_rotation_translation_from_transform(transform: jnp.ndarray):
    """Split a (*, 4, 4) transform into rotation (*, 3, 3) and translation (*, 3)."""
    return transform[..., :3, :3], transform[..., :3, 3]


def inverse_transform(transform: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid transform: R' = R^T, t' = -R^T t (transformation.py:140-159)."""
    rotation, translation = get_rotation_translation_from_transform(transform)
    inv_rotation = jnp.swapaxes(rotation, -1, -2)
    inv_translation = -jnp.einsum("...ij,...j->...i", inv_rotation, translation)
    return get_transform_from_rotation_translation(inv_rotation, inv_translation)


def compose_transforms(*transforms: jnp.ndarray) -> jnp.ndarray:
    """Compose transforms: the first is applied first (transformation.py:110-137).

    compose_transforms(T0, T1, ..., Tn) == Tn @ ... @ T1 @ T0.
    """
    out = transforms[0]
    for t in transforms[1:]:
        out = t @ out
    return out


def skew_symmetric_matrix(vector: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of (*, 3) vectors (transformation.py:162-184)."""
    x, y, z = vector[..., 0], vector[..., 1], vector[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues_rotation_matrix(axis: jnp.ndarray, angle: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix from (*, 3) axis and (*,) angle via Rodrigues' formula.

    Ref parity: transformation.py:187-211.
    """
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    omega = skew_symmetric_matrix(axis)
    sin = jnp.sin(angle)[..., None, None]
    cos = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), omega.shape)
    return eye + sin * omega + (1.0 - cos) * (omega @ omega)


def rodrigues_alignment_matrix(src_vector: jnp.ndarray, tgt_vector: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix aligning src_vector to tgt_vector (transformation.py:214-253).

    Degenerate anti-parallel case handled with the reference's convention:
    when sin ~ 0 and cos < 0, flip around an axis orthogonal to src.
    """
    src = src_vector / (jnp.linalg.norm(src_vector, axis=-1, keepdims=True) + eps)
    tgt = tgt_vector / (jnp.linalg.norm(tgt_vector, axis=-1, keepdims=True) + eps)
    axis = jnp.cross(src, tgt)
    sin = jnp.linalg.norm(axis, axis=-1)
    cos = jnp.sum(src * tgt, axis=-1)

    degenerate = sin < eps
    # For the anti-parallel degenerate case pick any vector orthogonal to src.
    helper = jnp.where(
        jnp.abs(src[..., :1]) < 0.9, jnp.array([1.0, 0.0, 0.0], src.dtype), jnp.array([0.0, 1.0, 0.0], src.dtype)
    )
    ortho = jnp.cross(src, jnp.broadcast_to(helper, src.shape))
    ortho = ortho / (jnp.linalg.norm(ortho, axis=-1, keepdims=True) + eps)

    axis = jnp.where(degenerate[..., None], ortho, axis / jnp.maximum(sin, eps)[..., None])
    omega = skew_symmetric_matrix(axis)
    sin_b = jnp.where(degenerate, jnp.zeros_like(sin), sin)[..., None, None]
    cos_b = jnp.where(degenerate, jnp.sign(cos) * jnp.ones_like(cos), cos)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), omega.shape)
    return eye + sin_b * omega + (1.0 - cos_b) * (omega @ omega)
