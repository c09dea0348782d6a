"""Pallas TPU kernel for the KPConv influence + neighbor-contraction chain.

The KPConv forward (models/kpconv.py::KPConv.aggregate, reference
modules/kpconv/kpconv.py:96-110) between the gather and the final
(M, K*C) @ (K*C, O) GEMM is:

    sq_d[m,h,k]  = ||n[m,h] - kp[k]||^2            (distance expansion)
    nw[m,h,k]    = relu(1 - sqrt(sq_d)/sigma) * valid[m,h]
    out[m,k,c]   = sum_h nw[m,h,k] * f[m,h,c]      ('mhk,mhc->mkc')

XLA materializes the (M, H, K) influence tensor and maps the contraction as
M batched (K, H) @ (H, C) matmuls — tiny operands on a 128x128 MXU, mostly
padding. This kernel keeps everything for a block of query rows resident in
VMEM and runs the whole chain as VPU elementwise work with an h-loop
accumulator: per h, the (bm, K) influence tile is an outer-product update
into the (bm, K, C) accumulator. No (M, H, K) intermediate ever reaches HBM.

Coordinates arrive as separate (M, H) x/y/z planes (a packed (M, H, 3)
block would pad its 3-wide minor dim to 128 lanes in VMEM).

`kpconv_aggregate` wraps the kernel in a custom VJP whose backward is the
plain-XLA einsum math (jax.vjp over the reference formula) — training uses
the fused forward and the proven gradient path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kpconv_kernel(xs_ref, ys_ref, zs_ref, valid_ref, feats_ref,
                   kx_ref, ky_ref, kz_ref, ksq_ref, out_ref,
                   *, num_neighbors: int, inv_sigma: float):
    kx = kx_ref[0, :][None, :]   # (1, K)
    ky = ky_ref[0, :][None, :]
    kz = kz_ref[0, :][None, :]
    ksq = ksq_ref[0, :][None, :]

    def body(h, acc):
        xh = xs_ref[:, pl.ds(h, 1)]        # (bm, 1)
        yh = ys_ref[:, pl.ds(h, 1)]
        zh = zs_ref[:, pl.ds(h, 1)]
        vh = valid_ref[:, pl.ds(h, 1)]
        n_sq = xh * xh + yh * yh + zh * zh  # (bm, 1)
        sq_d = jnp.maximum(n_sq - 2.0 * (xh * kx + yh * ky + zh * kz) + ksq, 0.0)  # (bm, K)
        w = jnp.maximum(1.0 - jnp.sqrt(sq_d) * inv_sigma, 0.0) * vh  # (bm, K)
        fh = feats_ref[:, pl.ds(h, 1), :][:, 0, :].astype(jnp.float32)  # (bm, C)
        return acc + w[:, :, None] * fh[:, None, :]

    acc0 = jnp.zeros(out_ref.shape, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, num_neighbors, body, acc0)


def kpconv_aggregate_pallas(
    neighbors: jnp.ndarray,   # (M, H, 3) f32 relative coords (query-centered)
    feats: jnp.ndarray,       # (M, H, C) f32/bf16 gathered neighbor features
    valid: jnp.ndarray,       # (M, H) bool
    kernel_points: jnp.ndarray,  # (K, 3) f32
    sigma: float,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused influence + neighbor contraction; returns (M, K, C) f32."""
    m, h, _ = neighbors.shape
    c = feats.shape[-1]
    k = kernel_points.shape[0]

    # VMEM budget: feats block + accumulator; shrink the block for wide C
    while block_m > 8 and block_m * h * c * 4 + block_m * k * c * 4 > 12 * 1024 * 1024:
        block_m //= 2
    mp = -(-m // block_m) * block_m

    nb = neighbors.astype(jnp.float32)
    xs = jnp.pad(nb[:, :, 0], ((0, mp - m), (0, 0)))
    ys = jnp.pad(nb[:, :, 1], ((0, mp - m), (0, 0)))
    zs = jnp.pad(nb[:, :, 2], ((0, mp - m), (0, 0)))
    vf = jnp.pad(valid.astype(jnp.float32), ((0, mp - m), (0, 0)))
    fp = jnp.pad(feats, ((0, mp - m), (0, 0), (0, 0)))

    kp = kernel_points.astype(jnp.float32)
    kx, ky, kz = kp[:, 0][None, :], kp[:, 1][None, :], kp[:, 2][None, :]
    ksq = jnp.sum(kp * kp, axis=-1)[None, :]

    kernel = functools.partial(_kpconv_kernel, num_neighbors=h, inv_sigma=1.0 / sigma)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs, ys, zs, vf, fp, kx, ky, kz, ksq)
    return out[:m]


def _xla_reference(neighbors, feats, valid, kernel_points, sigma):
    """The module's einsum formulation (models/kpconv.py:111-128), f32 —
    the numerical contract the kernel must match and the VJP source.
    `valid` may be bool or float (nonzero == valid)."""
    n_sq = jnp.sum(neighbors**2, axis=-1)
    k_sq = jnp.sum(kernel_points**2, axis=-1)
    nk = jnp.einsum("mhd,kd->mhk", neighbors, kernel_points,
                    preferred_element_type=jnp.float32)
    sq_d = jnp.maximum(n_sq[:, :, None] - 2.0 * nk + k_sq[None, None, :], 0.0)
    nw = jnp.maximum(1.0 - jnp.sqrt(sq_d) / sigma, 0.0)
    nw = nw * valid.astype(jnp.float32)[:, :, None]
    return jnp.einsum("mhk,mhc->mkc", nw, feats.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def make_kpconv_aggregate(sigma: float, block_m: int = 256, interpret: bool = False):
    """Differentiable fused KPConv aggregation.

    Returns f(neighbors, feats, valid_f32, kernel_points) -> (M, K, C) f32
    with the Pallas forward and the XLA einsum math as backward (gradients
    w.r.t. neighbors and feats; valid_f32 must be a float mask and
    kernel_points is a non-trainable buffer — both get zero cotangents)."""

    @jax.custom_vjp
    def f(neighbors, feats, valid_f32, kernel_points):
        return kpconv_aggregate_pallas(
            neighbors, feats, valid_f32, kernel_points, sigma, block_m, interpret
        )

    def fwd(neighbors, feats, valid_f32, kernel_points):
        return f(neighbors, feats, valid_f32, kernel_points), (neighbors, feats, valid_f32, kernel_points)

    def bwd(res, g):
        neighbors, feats, valid_f32, kernel_points = res
        _, vjp_fn = jax.vjp(
            lambda n, ft: _xla_reference(n, ft, valid_f32, kernel_points, sigma), neighbors, feats
        )
        dn, df = vjp_fn(g)
        return dn, df, jnp.zeros_like(valid_f32), jnp.zeros_like(kernel_points)

    f.defvjp(fwd, bwd)
    return f
