"""Bisect the KPConv block cost: time cumulative sub-steps of the
aggregate path at a large (level-0) and a tiny (level-3) shape to separate
per-element work from the apparent ~3 ms per-block floor seen in
tools/profile_backbone.py.

Usage: python tools/bisect_kpconv.py [--inner 20]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inner", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ref_geotransformer_tpu.ops.index import masked_gather

    def timeit(name, fn, *fargs):
        @jax.jit
        def looped(*a):
            def body(acc, i):
                scaled = (a[0] * (1.0 + 1e-7 * i.astype(jnp.float32)),) + a[1:]
                return acc + jnp.sum(fn(*scaled).astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(args.inner))
            return acc

        jax.device_get(looped(*fargs))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(looped(*fargs))
            best = min(best, time.time() - t0)
        print(f"{name:52s} {best / args.inner * 1e3:7.2f} ms", flush=True)

    K = 15
    rng = np.random.default_rng(0)
    kernel_pts = jnp.asarray(rng.normal(0, 0.03, (K, 3)), jnp.float32)
    sigma = 0.05

    for tag, B, N, M, H, C in [("level0", 2, 20480, 20480, 38, 32), ("level3", 2, 512, 512, 38, 256)]:
        print(f"--- {tag}: B={B} N={N} M={M} H={H} C={C} K={K} ---")
        pts = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, N, (B, M, H)), jnp.int32)
        w = jnp.asarray(rng.normal(size=(K, C, C)) * 0.05, jnp.bfloat16)

        def gather_only(pts, feats, idx):
            table = jnp.concatenate(
                [jax.lax.bitcast_convert_type(pts, jnp.bfloat16).reshape(B, N, 6), feats], -1)
            g = jax.vmap(lambda t, i: masked_gather(t, i, fill_value=0.0))(table, idx)
            return jnp.sum(g.astype(jnp.float32), axis=(1, 2, 3))

        timeit("gather (packed table)", lambda p, f, i: gather_only(p, f, i), pts, feats, idx)

        def with_influence(pts, feats, idx):
            table = jnp.concatenate(
                [jax.lax.bitcast_convert_type(pts, jnp.bfloat16).reshape(B, N, 6), feats], -1)
            g = jax.vmap(lambda t, i: masked_gather(t, i, fill_value=0.0))(table, idx)
            nb = jax.lax.bitcast_convert_type(g[..., :6].reshape(B, M, H, 3, 2), jnp.float32)
            nb = nb - pts[:, :M, None, :]
            n_sq = jnp.sum(nb**2, -1)
            k_sq = jnp.sum(kernel_pts**2, -1)
            nk = jnp.einsum("bmhd,kd->bmhk", nb, kernel_pts, preferred_element_type=jnp.float32)
            sq = jnp.maximum(n_sq[..., None] - 2 * nk + k_sq, 0.0)
            nw = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
            valid = idx < N
            nw = jnp.where(valid[..., None], nw, 0.0)
            return jnp.sum(nw, axis=(1, 2, 3)) + jnp.sum(g.astype(jnp.float32), axis=(1, 2, 3))

        timeit("+ influence (dist expansion, sqrt, mask)", with_influence, pts, feats, idx)

        def with_wsum(pts, feats, idx):
            table = jnp.concatenate(
                [jax.lax.bitcast_convert_type(pts, jnp.bfloat16).reshape(B, N, 6), feats], -1)
            g = jax.vmap(lambda t, i: masked_gather(t, i, fill_value=0.0))(table, idx)
            nb = jax.lax.bitcast_convert_type(g[..., :6].reshape(B, M, H, 3, 2), jnp.float32)
            nb = nb - pts[:, :M, None, :]
            nf = g[..., 6:]
            n_sq = jnp.sum(nb**2, -1)
            k_sq = jnp.sum(kernel_pts**2, -1)
            nk = jnp.einsum("bmhd,kd->bmhk", nb, kernel_pts, preferred_element_type=jnp.float32)
            sq = jnp.maximum(n_sq[..., None] - 2 * nk + k_sq, 0.0)
            nw = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
            valid = idx < N
            nw = jnp.where(valid[..., None], nw, 0.0)
            wf = jnp.einsum("bmhk,bmhc->bmkc", nw.astype(jnp.bfloat16), nf,
                            preferred_element_type=jnp.float32)
            return jnp.sum(wf, axis=(1, 2, 3))

        timeit("+ weighted sum einsum (mhk,mhc->mkc)", with_wsum, pts, feats, idx)

        def full(pts, feats, idx):
            table = jnp.concatenate(
                [jax.lax.bitcast_convert_type(pts, jnp.bfloat16).reshape(B, N, 6), feats], -1)
            g = jax.vmap(lambda t, i: masked_gather(t, i, fill_value=0.0))(table, idx)
            nb = jax.lax.bitcast_convert_type(g[..., :6].reshape(B, M, H, 3, 2), jnp.float32)
            nb = nb - pts[:, :M, None, :]
            nf = g[..., 6:]
            n_sq = jnp.sum(nb**2, -1)
            k_sq = jnp.sum(kernel_pts**2, -1)
            nk = jnp.einsum("bmhd,kd->bmhk", nb, kernel_pts, preferred_element_type=jnp.float32)
            sq = jnp.maximum(n_sq[..., None] - 2 * nk + k_sq, 0.0)
            nw = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
            valid = idx < N
            nw = jnp.where(valid[..., None], nw, 0.0)
            wf = jnp.einsum("bmhk,bmhc->bmkc", nw.astype(jnp.bfloat16), nf,
                            preferred_element_type=jnp.float32)
            out = jnp.einsum("bmkc,kco->bmo", wf.astype(jnp.bfloat16), w,
                             preferred_element_type=jnp.float32)
            nn_ = jnp.sum((jnp.sum(nf.astype(jnp.float32), -1) > 0).astype(jnp.float32), -1)
            out = out / jnp.maximum(nn_, 1.0)[..., None]
            return jnp.sum(out, axis=(1, 2))

        timeit("+ per-kernel matmul + featsum normalize (full)", full, pts, feats, idx)


def gather_variants():
    """Why is the in-model gather off the bench_gather floor? Compare
    formulations at level-0 shape."""
    import argparse
    import jax
    import jax.numpy as jnp

    from ref_geotransformer_tpu.ops.index import masked_gather

    parser = argparse.ArgumentParser()
    parser.add_argument("--inner", type=int, default=20)
    parser.add_argument("--variants", action="store_true")
    args, _ = parser.parse_known_args()

    import time

    def timeit(name, fn, *fargs):
        @jax.jit
        def looped(*a):
            def body(acc, i):
                scaled = (a[0],) + tuple((x + i) % a[1].shape[-2] if x.dtype == jnp.int32 else x for x in a[1:])
                return acc + jnp.sum(fn(*scaled).astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(args.inner, dtype=jnp.int32))
            return acc

        jax.device_get(looped(*fargs))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(looped(*fargs))
            best = min(best, time.time() - t0)
        print(f"{name:52s} {best / args.inner * 1e3:7.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    B, N, M, H, Cg = 2, 20480, 20480, 38, 38  # packed width 6+32
    table = jnp.asarray(rng.normal(size=(B, N, Cg)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, (B, M, H)), jnp.int32)

    timeit("vmap masked_gather (in-model formulation)",
           lambda t, i: jax.vmap(lambda tt, ii: masked_gather(tt, ii, fill_value=0.0))(t, i),
           table, idx)
    timeit("vmap jnp.take (no sentinel mask)",
           lambda t, i: jax.vmap(lambda tt, ii: jnp.take(tt, ii.reshape(-1), axis=0))(t, i),
           table, idx)

    def flat_take(t, i):
        tf = t.reshape(B * N, Cg)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        return jnp.take(tf, (i + off).reshape(-1), axis=0)

    timeit("flattened single take (B folded into rows)", flat_take, table, idx)

    def unrolled(t, i):
        return jnp.stack([jnp.take(t[b], i[b].reshape(-1), axis=0) for b in range(B)])

    timeit("unrolled per-batch take x2", unrolled, table, idx)

    t2 = jnp.asarray(rng.normal(size=(N, Cg)), jnp.bfloat16)
    i2 = jnp.asarray(rng.integers(0, N, (M, H)), jnp.int32)
    timeit("single-cloud take (bench_gather formulation)",
           lambda t, i: jnp.take(t, i.reshape(-1), axis=0), t2, i2)
    timeit("single-cloud masked_gather",
           lambda t, i: masked_gather(t, i, fill_value=0.0), t2, i2)


if __name__ == "__main__":
    if "--variants" in sys.argv:
        gather_variants()
    else:
        main()
