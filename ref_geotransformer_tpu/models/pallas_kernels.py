"""Pallas TPU kernels for hot inner loops.

sinkhorn_log_norm_pallas: the 100-iteration log-domain Sinkhorn
normalization (learnable_sinkhorn.py:13-18) as ONE kernel — the (K+1, K+1)
score blocks and both dual vectors stay resident in VMEM for all iterations,
eliminating per-iteration HBM round-trips of the XLA scan. Patch blocks are
processed in groups along the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _logsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


def _sinkhorn_kernel(scores_ref, log_mu_ref, log_nu_ref, out_ref, *, num_iterations: int):
    scores = scores_ref[:]  # (B_blk, M1, N1)
    log_mu = log_mu_ref[:]  # (B_blk, M1)
    log_nu = log_nu_ref[:]  # (B_blk, N1)

    def body(_, carry):
        u, v = carry
        u = log_mu - _logsumexp(scores + v[:, None, :], axis=2)
        v = log_nu - _logsumexp(scores + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[:] = scores + u[:, :, None] + v[:, None, :]


def sinkhorn_log_norm_pallas(
    padded_scores: jnp.ndarray,
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    num_iterations: int,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Args: padded_scores (B, M1, N1), log_mu (B, M1), log_nu (B, N1).
    Returns scores + u + v after `num_iterations` row/col normalizations."""
    b, m1, n1 = padded_scores.shape
    block_b = min(block_b, b)
    # pad B to a multiple of the block (masked blocks are still computed but
    # their outputs are dropped; duals of padded rows are well-defined since
    # scores are finite)
    pad = (-b) % block_b
    if pad:
        padded_scores = jnp.pad(padded_scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
    bb = padded_scores.shape[0]

    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, num_iterations=num_iterations),
        grid=(bb // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, m1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, m1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bb, m1, n1), padded_scores.dtype),
        interpret=interpret,
    )(padded_scores, log_mu, log_nu)
    return out[:b]
