"""KPConv gather micro-benchmark (VERDICT round-1 item 3).

Measures, on the current backend, the cost of the backbone's dominant memory
op — the (M, H)-indexed row gather from an (N, W) table — across sizes,
widths, dtypes, and index distributions, plus candidate replacements:

  take        jnp.take(table, idx.ravel(), axis=0)   [current masked_gather]
  take_sorted same, with pre-sorted flat indices      [locality sensitivity]
  onehot_full (M*H, N) one-hot @ (N, W) matmul        [viable only for small N]
  onehot_win  block-windowed one-hot matmul: queries in blocks of B rows,
              each block gathers only from a Wn-row window of the table
              starting at its min index (requires index locality; entries
              outside the window are dropped — the bench reports coverage)

Also reports the neighbor-index spread statistics of the real demo pyramid
(per-block window size needed for full coverage), which decides whether the
windowed scheme is admissible.

Usage: python tools/bench_gather.py [--stats-only]
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


INNER_ITERS = 50


def timeit(op, table, idx, proj, outer=3):
    """Per-op cost with the axon tunnel's per-CALL overhead amortized away:
    the op runs INNER_ITERS times inside ONE jitted lax.scan (each iteration
    shifts the indices so no work can be CSE'd/hoisted), outputs are reduced
    on device, and the best of `outer` calls is divided by INNER_ITERS.

    op(table, idx, proj) -> small array."""
    import jax
    import jax.numpy as jnp

    n = table.shape[0]

    @jax.jit
    def looped(table, idx, proj):
        def body(acc, shift):
            shifted = (idx + shift) % n
            return acc + op(table, shifted, proj), None

        acc, _ = jax.lax.scan(body, jnp.zeros((16,), jnp.float32), jnp.arange(INNER_ITERS, dtype=jnp.int32))
        return acc

    jax.device_get(looped(table, idx, proj))  # compile + sync
    best = float("inf")
    for _ in range(outer):
        t0 = time.time()
        jax.device_get(looped(table, idx, proj))
        best = min(best, time.time() - t0)
    return best / INNER_ITERS


def bench_variants():
    import jax
    import jax.numpy as jnp

    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    # stage-1-like and stage-2-like shapes (demo caps). Every variant ends
    # in the same consumer — project to 16 channels, relu, reduce rows —
    # so outputs stay tiny (tunnel-fetch-free) and XLA can't algebraically
    # collapse the one-hot matmuls.
    for n, m, h, c in [(20480, 20480, 38, 64), (20480, 6144, 38, 128), (6144, 6144, 36, 128), (2048, 2048, 36, 256)]:
        rng = np.random.default_rng(0)
        for dtype in (jnp.float32, jnp.bfloat16):
            table = jnp.asarray(rng.normal(size=(n, c)), dtype)
            proj = jnp.asarray(rng.normal(size=(c, 16)), dtype)
            # spatially-correlated indices: neighbors of query i cluster
            # around i * n/m (mimics voxel-sorted clouds)
            centers = (np.arange(m) * (n / m)).astype(np.int64)
            spread = rng.integers(-600, 600, (m, h))
            idx = jnp.asarray(np.clip(centers[:, None] + spread, 0, n - 1), jnp.int32)

            def consume(g, p):  # (R, C) -> (16,)
                return jnp.sum(jnp.maximum(jnp.dot(g, p, preferred_element_type=jnp.float32), 0.0), axis=0)

            def take_fn(t, i, p):
                return consume(jnp.take(t, i.reshape(-1), axis=0), p)

            t_take = timeit(take_fn, table, idx, proj)

            flat_sorted = jnp.sort(idx.reshape(-1)).reshape(idx.shape)
            t_sorted = timeit(take_fn, table, flat_sorted, proj)

            # windowed one-hot: B-query blocks, window Wn rows
            for b_rows, wn in [(256, 2048), (512, 4096), (512, 8192)]:
                if wn > n:
                    continue
                nb = m // b_rows

                def onehot_win(t, i, p, _wn=wn, _nb=nb, _b=b_rows):
                    ib = i.reshape(-1)[: _nb * _b * h].reshape(_nb, _b * h)
                    starts = jnp.clip(jnp.min(ib, axis=1), 0, n - _wn)

                    def body(acc, blk):
                        start, ii = blk
                        win = jax.lax.dynamic_slice(t, (start, 0), (_wn, t.shape[1]))  # (Wn, C)
                        rel = ii - start  # (B*H,)
                        oh = (rel[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, _wn), 1)).astype(t.dtype)
                        g = jnp.dot(oh, win, preferred_element_type=jnp.float32).astype(t.dtype)
                        return acc + consume(g, p), None

                    acc, _ = jax.lax.scan(body, jnp.zeros((16,), jnp.float32), (starts, ib))
                    return acc

                t_win = timeit(onehot_win, table, idx, proj)
                report(n=n, m=m, h=h, c=c, dtype=str(dtype.__name__), variant=f"onehot_win_b{b_rows}_w{wn}",
                       ms=round(t_win * 1e3, 3), ns_per_row=round(t_win / (m * h) * 1e9, 2))

            for name, t in [("take", t_take), ("take_sorted", t_sorted)]:
                report(n=n, m=m, h=h, c=c, dtype=str(dtype.__name__), variant=name,
                       ms=round(t * 1e3, 3), ns_per_row=round(t / (m * h) * 1e9, 2))
    return results


def demo_spread_stats():
    """Neighbor-index spread of the real demo pyramid: for each level and
    query block size, the p50/p95/max window needed for full coverage."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, osp.join(ROOT, "experiments", "geotransformer_3dmatch_stage4"))
    from config import make_cfg

    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points

    cfg = make_cfg(demo=True)
    ref_raw = np.load(osp.join(ROOT, "data", "demo", "ref.npy")).astype(np.float32)
    src_raw = np.load(osp.join(ROOT, "data", "demo", "src.npy")).astype(np.float32)
    cap0 = cfg.capacities.points[0]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)
    data = build_registration_inputs(
        jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m),
        cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
        cfg.capacities.neighbor_limits, cfg.capacities.points,
        search_chunk=cfg.capacities.search_chunk,
    )
    stats = []
    for side in ("ref", "src"):
        for lvl, neigh in enumerate(data[side]["neighbors"]):
            idx = np.asarray(neigh)
            n = idx.max()  # sentinel == len(support)
            valid = idx < n
            for b in (128, 256, 512):
                nb = idx.shape[0] // b
                spreads = []
                for blk in range(nb):
                    ii = idx[blk * b:(blk + 1) * b]
                    vv = valid[blk * b:(blk + 1) * b]
                    if not vv.any():
                        continue
                    sel = ii[vv]
                    spreads.append(int(sel.max() - sel.min()) + 1)
                spreads = np.array(spreads)
                stats.append(dict(side=side, level=lvl, block=b,
                                  p50=int(np.percentile(spreads, 50)),
                                  p95=int(np.percentile(spreads, 95)),
                                  max=int(spreads.max()),
                                  support=int(idx.max())))
                print(json.dumps(stats[-1]), flush=True)
    return stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stats-only", action="store_true")
    args = parser.parse_args()
    print("== demo pyramid neighbor-index spread ==", flush=True)
    demo_spread_stats()
    if not args.stats_only:
        print("== gather variants ==", flush=True)
        bench_variants()


if __name__ == "__main__":
    main()
