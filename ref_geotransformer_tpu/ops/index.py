"""Gather helpers with the sentinel-row ("shadow point") convention.

The whole pipeline uses index == N (one past the last row) to mark invalid
neighbor slots, mirroring the reference convention established by its C++
radius search (radius_neighbors_cpu.cpp:80-87) and consumed by shadow-row
appends in kpconv.py:91-103 and kpconv/functional.py:19-64.

TPU note — the custom vmap rule is a measured 3.7x win: XLA lowers a
BATCHED gather (what `vmap(take)` produces) at ~13 ns/row on v5e, vs
~3.4 ns/row for the same rows as ONE flat gather. Since the model runs
every cloud-pair vmapped (and batch>1 vmaps again), `masked_gather`
carries a `jax.custom_batching.custom_vmap` rule that folds each batch
axis into the row axis with index offsets, recursively, so any vmap
nesting still lowers to a single flat gather (tools/bisect_kpconv.py
--variants for the measurements). `custom_vmap` does not compose with
reverse-mode AD, so the public function is a `custom_vjp` whose forward
uses the rule-carrying core and whose backward is the explicit
scatter-add transpose of the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching


def index_select(data: jnp.ndarray, indices: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """N-D gather: result shape = indices.shape ++ data.shape[axis+1:] (prefixed
    by data.shape[:axis]).

    Ref parity: modules/ops/index_select.py:4-31. Indices must be in range.
    """
    return jnp.take(data, indices, axis=axis)


@custom_batching.custom_vmap
def _gather_core(data: jnp.ndarray, indices: jnp.ndarray, fill_value: jnp.ndarray) -> jnp.ndarray:
    n = data.shape[0]
    pad_row = jnp.full((1,) + data.shape[1:], fill_value, dtype=data.dtype)
    padded = jnp.concatenate([data, pad_row], axis=0)
    return jnp.take(padded, jnp.minimum(indices, n), axis=0)


@_gather_core.def_vmap
def _gather_core_vmap(axis_size, in_batched, data, indices, fill_value):
    data_b, idx_b, fill_b = in_batched
    assert not fill_b, "masked_gather: fill_value must be an unbatched scalar"
    b = axis_size
    if data_b and not idx_b:
        # shared indices across batched tables: broadcast then fall through
        indices = jnp.broadcast_to(indices, (b,) + indices.shape)
        idx_b = True
    if data_b and idx_b:
        # fold the batch axis into the row axis: ONE flat gather. Per-cloud
        # sentinel (>= n) becomes the flat sentinel (>= b*n) so the recursive
        # call's pad row still supplies fill_value.
        n = data.shape[1]
        flat = data.reshape((b * n,) + data.shape[2:])
        offs = (jnp.arange(b, dtype=indices.dtype) * n).reshape((b,) + (1,) * (indices.ndim - 1))
        flat_idx = jnp.where(indices < n, indices + offs, b * n)
        return _gather_core(flat, flat_idx, fill_value), True
    if idx_b and not data_b:
        # shared table: the batch axis is just another indices dim
        return _gather_core(data, indices, fill_value), True
    return _gather_core(data, indices, fill_value), False


@jax.custom_vjp
def _masked_gather(data: jnp.ndarray, indices: jnp.ndarray, fill_value: jnp.ndarray) -> jnp.ndarray:
    return _gather_core(data, indices, fill_value)


def _masked_gather_fwd(data, indices, fill_value):
    # residuals must be JAX values: a (N, 0) empty array carries data's row
    # count and dtype at zero bytes
    shape_token = jnp.zeros((data.shape[0], 0), data.dtype)
    return _gather_core(data, indices, fill_value), (shape_token, indices)


def _masked_gather_bwd(res, ct):
    shape_token, indices = res
    n = shape_token.shape[0]
    dtype = shape_token.dtype
    trailing = ct.shape[indices.ndim :]
    shape = (n,) + trailing
    valid = indices < n
    vmask = valid.reshape(valid.shape + (1,) * len(trailing))
    ct_masked = jnp.where(vmask, ct, 0.0)
    d_data = (
        jnp.zeros(shape, ct.dtype)
        .at[jnp.minimum(indices, n - 1).reshape(-1)]
        .add(ct_masked.reshape((-1,) + trailing))
        .astype(dtype)
    )
    d_fill = jnp.sum(jnp.where(vmask, 0.0, ct))
    d_idx = np.zeros(indices.shape, jax.dtypes.float0)
    return d_data, d_idx, d_fill


_masked_gather.defvjp(_masked_gather_fwd, _masked_gather_bwd)


def masked_gather(
    data: jnp.ndarray,
    indices: jnp.ndarray,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Gather rows of `data` (N, C...) by `indices` (...,) where index == N
    (or anything >= N) yields `fill_value` rows.

    Lowers to one XLA gather (pad-row + clipped take); under any vmap
    nesting the custom batching rule keeps it ONE FLAT gather (see module
    docstring).
    """
    return _masked_gather(data, indices, jnp.asarray(fill_value, dtype=data.dtype))
