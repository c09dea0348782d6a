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


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.device_get(out)  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.time() - t0) / iters


def bench_variants():
    import jax
    import jax.numpy as jnp

    results = []
    # stage-1-like and stage-2-like shapes (demo caps)
    for n, m, h, c in [(20480, 20480, 38, 64), (20480, 6144, 38, 128), (6144, 6144, 36, 128), (2048, 2048, 36, 256)]:
        rng = np.random.default_rng(0)
        for dtype in (jnp.float32, jnp.bfloat16):
            table = jnp.asarray(rng.normal(size=(n, c)), dtype)
            # spatially-correlated indices: neighbors of query i cluster
            # around i * n/m (mimics voxel-sorted clouds)
            centers = (np.arange(m) * (n / m)).astype(np.int64)
            spread = rng.integers(-600, 600, (m, h))
            idx = jnp.asarray(np.clip(centers[:, None] + spread, 0, n - 1), jnp.int32)

            t_take = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, idx)

            flat_sorted = jnp.sort(idx.reshape(-1))
            t_sorted = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, flat_sorted)

            # windowed one-hot: B-query blocks, window Wn rows
            for b_rows, wn in [(256, 2048), (512, 4096)]:
                nb = m // b_rows

                def onehot_win(t, i):
                    ib = i[: nb * b_rows].reshape(nb, b_rows * h)
                    starts = jnp.min(ib, axis=1)
                    starts = jnp.clip(starts, 0, n - wn)

                    def body(carry, blk):
                        start, ii = blk
                        win = jax.lax.dynamic_slice(t, (start, 0), (wn, t.shape[1]))  # (Wn, C)
                        rel = ii - start  # (B*H,)
                        oh = (rel[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, wn), 1)).astype(t.dtype)
                        return carry, jnp.dot(oh, win, preferred_element_type=jnp.float32)

                    _, out = jax.lax.scan(body, 0, (starts, ib))
                    return out

                t_win = timeit(jax.jit(onehot_win), table, idx)
                results.append(
                    dict(n=n, m=m, h=h, c=c, dtype=str(dtype.__name__), variant=f"onehot_win_b{b_rows}_w{wn}",
                         ms=round(t_win * 1e3, 3), ns_per_row=round(t_win / (m * h) * 1e9, 2))
                )

            for name, t in [("take", t_take), ("take_sorted", t_sorted)]:
                results.append(
                    dict(n=n, m=m, h=h, c=c, dtype=str(dtype.__name__), variant=name,
                         ms=round(t * 1e3, 3), ns_per_row=round(t / (m * h) * 1e9, 2))
                )
            print(json.dumps(results[-2]), flush=True)
            print(json.dumps(results[-1]), flush=True)
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
