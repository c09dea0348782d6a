"""Pallas TPU kernels for hot inner loops.

sinkhorn_log_norm_pallas: the 100-iteration log-domain Sinkhorn
normalization (learnable_sinkhorn.py:13-18) as ONE kernel — the (K+1, K+1)
score blocks and both dual vectors stay resident in VMEM for all iterations,
eliminating per-iteration HBM round-trips of the XLA scan. Patch blocks are
processed in groups along the grid.

geometric_embedding_pallas: the pair-distance + triplet-angle structure
embedding (geotransformer.py:25-72) fused per (N, N) tile — sinusoid
features, both linear projections and the angle-k max reduction never touch
HBM (the XLA path materializes an (N, N, k, C) tensor). A custom VJP
(geometric_embedding_pallas_vjp) provides the projection-parameter gradients
(the geometric indices are stop-gradient by reference semantics,
geotransformer.py:25 @torch.no_grad), so training can use the fused kernel
too; the backward recomputes sinusoids tile-by-tile and accumulates dW/db
across the grid.
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


# --- fast sincos: shared Cody-Waite range reduction + Chebyshev-fit
# polynomials on [-pi, pi] (near-minimax lstsq over Chebyshev nodes; see
# DESIGN.md r05). f32 max abs error vs numpy: sin 7.4e-7, cos 6.1e-7 —
# orders of magnitude under the quality tolerance. ~15 VPU ops per
# sin+cos PAIR vs ~45 for XLA's precise sin + cos, and the kernel is
# transcendental-bound (~1G evals/pair at full caps, DESIGN.md §6.5).
_SIN_COEF = (0.999999937817121, -0.16666621107343133, 8.332791496948891e-03,
             -1.9817630839614127e-04, 2.708830992845235e-06, -2.069812794618725e-08)
_COS_COEF = (0.9999999890385508, -0.49999989100502806, 4.166648921445135e-02,
             -1.388780359207217e-03, 2.4769883472518815e-05, -2.707903006926881e-07,
             1.7245088938070118e-09)
_INV_2PI = 0.15915494309189535
_PI2_HI = 6.28125            # exact in f32 (few mantissa bits)
_PI2_LO = 1.9353071795864769e-03  # 2*pi - _PI2_HI


def _fast_sincos(x: jnp.ndarray):
    """(sin x, cos x) for |x| up to ~1e3 rad (arguments here stay < ~1e2:
    d/sigma_d * div_term and angle * factor_a * div_term)."""
    q = jnp.round(x * _INV_2PI)
    r = (x - q * _PI2_HI) - q * _PI2_LO  # [-pi, pi]
    r2 = r * r
    # Horner seeded from r2 * c_top (python-float literals only: Pallas
    # kernels may not capture array constants)
    s = r2 * _SIN_COEF[-1] + _SIN_COEF[-2]
    for coef in _SIN_COEF[-3::-1]:
        s = s * r2 + coef
    c = r2 * _COS_COEF[-1] + _COS_COEF[-2]
    for coef in _COS_COEF[-3::-1]:
        c = c * r2 + coef
    return s * r, c


def _atan2_nonneg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 for y >= 0 (angle in [0, pi]) from basic ops — Mosaic has no
    atan/atan2 primitive. Range-reduce to [0, 1] and evaluate a minimax
    polynomial (|err| ~ 1e-5 rad, far below the sinusoid tolerance)."""
    ax = jnp.abs(x)
    mn = jnp.minimum(ax, y)
    mx = jnp.maximum(ax, y)
    r = mn / jnp.maximum(mx, 1e-30)
    r2 = r * r
    a = r * (0.9998660 + r2 * (-0.3302995 + r2 * (0.1801410 + r2 * (-0.0851330 + r2 * 0.0208351))))
    a = jnp.where(y > ax, jnp.pi / 2.0 - a, a)
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    return a


def _geo_embedding_kernel(
    points_ref,       # (N, 3)
    ref_vecs_ref,     # (N, k, 3)
    div_term_ref,     # (1, C/2)
    wd_ref,           # (C, C)
    bd_ref,           # (1, C)
    wa_ref,           # (C, C)
    ba_ref,           # (1, C)
    out_ref,          # (TM, TN, C)
    *,
    tile_m: int,
    tile_n: int,
    sigma_d: float,
    factor_a: float,
    angle_k: int,
    d_model: int,
    fast_sincos: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row_pts = points_ref[pl.ds(i * tile_m, tile_m), :]  # (TM, 3)
    col_pts = points_ref[pl.ds(j * tile_n, tile_n), :]  # (TN, 3)
    div_term = div_term_ref[0, :]  # (C/2,)

    # anc[n, m] = col[m] - row[n]
    anc = col_pts[None, :, :] - row_pts[:, None, :]  # (TM, TN, 3)
    d = jnp.sqrt(jnp.maximum(jnp.sum(anc**2, axis=-1), 0.0))  # (TM, TN)

    def sinusoid_project(idx, w, bvec):
        # idx (TM, TN) -> (TM*TN, C) projected. The sinusoid math stays f32;
        # the projection rides the MXU in the weights' dtype (bf16 when the
        # wrapper enables it: sin/cos values are in [-1, 1], so bf16's ~3
        # decimal digits cost <0.4% relative error on the operands while the
        # accumulation stays f32 — measured e2e cosine in DESIGN.md r04)
        omegas = idx.reshape(tile_m * tile_n, 1) * div_term[None, :]  # (R, C/2)
        if fast_sincos:
            sin_o, cos_o = _fast_sincos(omegas)
        else:
            sin_o, cos_o = jnp.sin(omegas), jnp.cos(omegas)
        emb = jnp.concatenate([sin_o, cos_o], axis=-1)  # (R, C)
        return jnp.dot(emb.astype(w.dtype), w, preferred_element_type=jnp.float32) + bvec

    d_proj = sinusoid_project(d / sigma_d, wd_ref[:], bd_ref[0, :])  # (R, C)

    a_max = jnp.full((tile_m * tile_n, d_model), -jnp.inf, jnp.float32)
    for t in range(angle_k):
        rv = ref_vecs_ref[pl.ds(i * tile_m, tile_m), t, :]  # (TM, 3)
        rvb = rv[:, None, :]
        cross = jnp.cross(rvb, anc)
        # no epsilon floor: atan2(0, 0) must stay 0 on the diagonal
        # (zero anchor vectors), matching the XLA path exactly
        sin_v = jnp.sqrt(jnp.maximum(jnp.sum(cross**2, axis=-1), 0.0))
        cos_v = jnp.sum(rvb * anc, axis=-1)
        ang = _atan2_nonneg(sin_v, cos_v) * factor_a  # (TM, TN)
        a_proj = sinusoid_project(ang, wa_ref[:], ba_ref[0, :])
        a_max = jnp.maximum(a_max, a_proj)

    out_ref[:] = (d_proj + a_max).reshape(tile_m, tile_n, d_model)


def geometric_embedding_pallas(
    points: jnp.ndarray,      # (N, 3)
    ref_vectors: jnp.ndarray,  # (N, k, 3) vectors to the k nearest nodes
    div_term: jnp.ndarray,     # (C/2,) sinusoid frequencies
    wd: jnp.ndarray,           # (C, C) proj_d kernel
    bd: jnp.ndarray,           # (C,) proj_d bias
    wa: jnp.ndarray,           # (C, C) proj_a kernel
    ba: jnp.ndarray,           # (C,) proj_a bias
    sigma_d: float,
    factor_a: float,
    tile: int = 64,
    interpret: bool = False,
    mxu_dtype=None,
    fast_sincos: bool = True,
) -> jnp.ndarray:
    """Fused (N, N, C) geometric structure embedding ('max' angle reduction).

    mxu_dtype (e.g. jnp.bfloat16) casts ONLY the projection matmul operands
    — sinusoid math, accumulation, bias add, angle max, and the output stay
    f32. At N=1024/C=256 the four per-tile (tile^2, C)@(C, C) f32 matmuls
    dominate the kernel (the f32 MXU is 4x slower than bf16); see
    DESIGN.md r04 for the measured A/B and accuracy check.
    """
    n, _ = points.shape
    k = ref_vectors.shape[1]
    c = wd.shape[0]
    assert n % tile == 0, f"node capacity {n} must be a multiple of tile {tile}"
    if mxu_dtype is not None:
        wd = wd.astype(mxu_dtype)
        wa = wa.astype(mxu_dtype)

    import functools as _ft

    kernel = _ft.partial(
        _geo_embedding_kernel,
        tile_m=tile,
        tile_n=tile,
        sigma_d=sigma_d,
        factor_a=factor_a,
        angle_k=k,
        d_model=c,
        fast_sincos=fast_sincos,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile, n // tile),
        in_specs=[
            pl.BlockSpec((n, 3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, 3), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c // 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(points, ref_vectors, div_term[None, :], wd, bd[None, :], wa, ba[None, :])


def _geo_embedding_bwd_kernel(
    points_ref, ref_vecs_ref, div_term_ref, wa_ref, ba_ref, g_ref,
    dwd_ref, dbd_ref, dwa_ref, dba_ref,
    *, tile_m: int, tile_n: int, sigma_d: float, factor_a: float, angle_k: int, d_model: int,
    fast_sincos: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dbd_ref[:] = jnp.zeros_like(dbd_ref)
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dba_ref[:] = jnp.zeros_like(dba_ref)

    row_pts = points_ref[pl.ds(i * tile_m, tile_m), :]
    col_pts = points_ref[pl.ds(j * tile_n, tile_n), :]
    div_term = div_term_ref[0, :]
    g = g_ref[:].reshape(tile_m * tile_n, d_model)  # (R, C)

    anc = col_pts[None, :, :] - row_pts[:, None, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(anc**2, axis=-1), 0.0))

    def sinusoid(idx):
        omegas = idx.reshape(tile_m * tile_n, 1) * div_term[None, :]
        if fast_sincos:
            sin_o, cos_o = _fast_sincos(omegas)
        else:
            sin_o, cos_o = jnp.sin(omegas), jnp.cos(omegas)
        return jnp.concatenate([sin_o, cos_o], axis=-1)  # (R, C)

    emb_d = sinusoid(d / sigma_d)
    dwd_ref[:] += jnp.dot(emb_d.T, g, preferred_element_type=jnp.float32)
    dbd_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    dba_ref[:] += jnp.sum(g, axis=0, keepdims=True)  # the winning branch always adds b_a

    # recompute all k projections, find the per-channel max, route gradients
    projs = []
    embs = []
    for t in range(angle_k):
        rv = ref_vecs_ref[pl.ds(i * tile_m, tile_m), t, :]
        rvb = rv[:, None, :]
        cross = jnp.cross(rvb, anc)
        sin_v = jnp.sqrt(jnp.maximum(jnp.sum(cross**2, axis=-1), 0.0))
        cos_v = jnp.sum(rvb * anc, axis=-1)
        ang = _atan2_nonneg(sin_v, cos_v) * factor_a
        e = sinusoid(ang)
        embs.append(e)
        projs.append(jnp.dot(e, wa_ref[:], preferred_element_type=jnp.float32) + ba_ref[0, :])
    stacked = jnp.stack(projs, axis=0)  # (k, R, C)
    winners = jnp.max(stacked, axis=0)  # (R, C)
    # split gradient equally among ties (matches lax.reduce_max's vjp)
    ties = jnp.sum((stacked == winners[None]).astype(jnp.float32), axis=0)
    for t in range(angle_k):
        mask = (projs[t] == winners).astype(jnp.float32) / jnp.maximum(ties, 1.0)
        dwa_ref[:] += jnp.dot(embs[t].T, g * mask, preferred_element_type=jnp.float32)


def _geo_embedding_bwd(
    points, ref_vectors, div_term, wa, ba, g, sigma_d, factor_a, tile, interpret=False,
    fast_sincos=True,
):
    n = points.shape[0]
    k = ref_vectors.shape[1]
    c = wa.shape[0]
    kernel = functools.partial(
        _geo_embedding_bwd_kernel,
        tile_m=tile, tile_n=tile, sigma_d=sigma_d, factor_a=factor_a, angle_k=k, d_model=c,
        fast_sincos=fast_sincos,
    )
    dwd, dbd, dwa, dba = pl.pallas_call(
        kernel,
        grid=(n // tile, n // tile),
        in_specs=[
            pl.BlockSpec((n, 3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, 3), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c // 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(points, ref_vectors, div_term[None, :], wa, ba[None, :], g)
    return dwd, dbd[0], dwa, dba[0]


def make_geometric_embedding_vjp(sigma_d: float, factor_a: float, tile: int = 64,
                                 interpret: bool = False, mxu_dtype=None,
                                 fast_sincos: bool = True):
    """Differentiable (w.r.t. the projection params) fused embedding.

    Returns f(points, ref_vectors, div_term, wd, bd, wa, ba) -> (N, N, C).
    Gradients flow to wd/bd/wa/ba only (geometry is stop-gradient by
    reference semantics). `mxu_dtype` applies to the FORWARD projection
    matmuls only (standard mixed precision: the backward keeps f32 math).
    """

    @jax.custom_vjp
    def f(points, ref_vectors, div_term, wd, bd, wa, ba):
        return geometric_embedding_pallas(
            points, ref_vectors, div_term, wd, bd, wa, ba, sigma_d, factor_a, tile,
            interpret, mxu_dtype=mxu_dtype, fast_sincos=fast_sincos,
        )

    def fwd(points, ref_vectors, div_term, wd, bd, wa, ba):
        out = f(points, ref_vectors, div_term, wd, bd, wa, ba)
        return out, (points, ref_vectors, div_term, wa, ba)

    def bwd(residuals, g):
        points, ref_vectors, div_term, wa, ba = residuals
        dwd, dbd, dwa, dba = _geo_embedding_bwd(
            points, ref_vectors, div_term, wa, ba, g, sigma_d, factor_a, tile, interpret,
            fast_sincos=fast_sincos,
        )
        zero_p = jnp.zeros_like(points)
        zero_r = jnp.zeros_like(ref_vectors)
        zero_dt = jnp.zeros_like(div_term)
        return zero_p, zero_r, zero_dt, dwd, dbd, dwa, dba

    f.defvjp(fwd, bwd)
    return f
