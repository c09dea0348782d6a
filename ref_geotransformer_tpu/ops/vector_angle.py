"""Angle utilities (ref parity: modules/ops/vector_angle.py:17-34)."""

from __future__ import annotations

import jax.numpy as jnp


def rad2deg(rad: jnp.ndarray) -> jnp.ndarray:
    return rad * (180.0 / jnp.pi)


def deg2rad(deg: jnp.ndarray) -> jnp.ndarray:
    return deg * (jnp.pi / 180.0)


def vector_angle(x: jnp.ndarray, y: jnp.ndarray, degrees: bool = False) -> jnp.ndarray:
    """Angle between broadcastable (*, 3) vectors via atan2(|cross|, dot).

    Numerically robust near 0 and pi (unlike arccos of the dot product).
    """
    cross = jnp.cross(x, y)
    sin = jnp.linalg.norm(cross, axis=-1)
    cos = jnp.sum(x * y, axis=-1)
    angle = jnp.arctan2(sin, cos)
    if degrees:
        angle = rad2deg(angle)
    return angle
