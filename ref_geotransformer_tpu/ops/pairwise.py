"""Pairwise squared-distance matrices (MXU-friendly inner-product form).

Ref parity: /root/reference/geotransformer/modules/ops/pairwise_distance.py:4-31.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def pairwise_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    normalized: bool = False,
    channel_first: bool = False,
) -> jnp.ndarray:
    """Batched squared-distance matrix via the ||x||^2 + ||y||^2 - 2 x.y expansion.

    Args:
        x: (*, N, C) or (*, C, N) if channel_first.
        y: (*, M, C) or (*, C, M) if channel_first.
        normalized: if inputs are L2-normalized, use the cheaper 2 - 2 x.y form.
        channel_first: inputs are channel-first.

    Returns:
        (*, N, M) squared distances, clamped to >= 0.
    """
    if channel_first:
        xy = jnp.einsum("...cn,...cm->...nm", x, y)
        xx = jnp.sum(x**2, axis=-2)
        yy = jnp.sum(y**2, axis=-2)
    else:
        xy = jnp.einsum("...nc,...mc->...nm", x, y)
        xx = jnp.sum(x**2, axis=-1)
        yy = jnp.sum(y**2, axis=-1)
    if normalized:
        sq_distances = 2.0 - 2.0 * xy
    else:
        sq_distances = xx[..., :, None] - 2.0 * xy + yy[..., None, :]
    return jnp.maximum(sq_distances, 0.0)


def masked_pairwise_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_masks: Optional[jnp.ndarray] = None,
    y_masks: Optional[jnp.ndarray] = None,
    normalized: bool = False,
    fill: float = 1e12,
) -> jnp.ndarray:
    """pairwise_distance with invalid rows/cols filled with `fill`.

    Masks are validity masks (True = real point). This is the static-shape
    workhorse: padded slots are pushed to `fill` so argmin/topk never select
    them.
    """
    sq = pairwise_distance(x, y, normalized=normalized)
    if x_masks is not None:
        sq = jnp.where(x_masks[..., :, None], sq, fill)
    if y_masks is not None:
        sq = jnp.where(y_masks[..., None, :], sq, fill)
    return sq
