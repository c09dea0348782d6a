"""Gather helpers with the sentinel-row ("shadow point") convention.

The whole pipeline uses index == N (one past the last row) to mark invalid
neighbor slots, mirroring the reference convention established by its C++
radius search (radius_neighbors_cpu.cpp:80-87) and consumed by shadow-row
appends in kpconv.py:91-103 and kpconv/functional.py:19-64.
"""

from __future__ import annotations

import jax.numpy as jnp


def index_select(data: jnp.ndarray, indices: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """N-D gather: result shape = indices.shape ++ data.shape[axis+1:] (prefixed
    by data.shape[:axis]).

    Ref parity: modules/ops/index_select.py:4-31. Indices must be in range.
    """
    return jnp.take(data, indices, axis=axis)


def masked_gather(
    data: jnp.ndarray,
    indices: jnp.ndarray,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Gather rows of `data` (N, C...) by `indices` (...,) where index == N
    (or anything >= N) yields `fill_value` rows.

    Implemented as a pad-row gather so it lowers to one XLA gather: appends a
    fill row then clips indices to N.
    """
    n = data.shape[0]
    pad_row = jnp.full((1,) + data.shape[1:], fill_value, dtype=data.dtype)
    padded = jnp.concatenate([data, pad_row], axis=0)
    return jnp.take(padded, jnp.minimum(indices, n), axis=0)
