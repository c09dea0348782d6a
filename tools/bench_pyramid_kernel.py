"""A/B the pyramid neighbor-selection variants on the real L0 search shape.

For each variant: scan-amortized time (tools/_timing.py floor correction)
AND within-radius recall vs the exact top-k on the same real demo cloud —
index-set recall (strict) and distance-profile recall (tie-aware; dense
scans are full of near-equidistant neighbors, so a different-but-
equidistant pick is functionally equivalent for KPConv).

This gate retired the grid-bucket path in round 1 and the Pallas group-min
prefilter in round 4 (its VPU distance pass alone cost 2.4x the whole
MXU-based approx path AND it miscomputed on real hardware — full numbers
in DESIGN.md r04).

Usage: python tools/bench_pyramid_kernel.py [--inner 20] [--out FILE.json]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(
    0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments", "geotransformer_3dmatch_stage4")
)

import numpy as np

from _timing import scan_timeit


def recall_vs_exact(idx, exact_idx, exact_sq, radius_sq, k):
    """Recall over the exact WITHIN-RADIUS neighbors only. Slots beyond the
    radius are masked to the sentinel by radius_search downstream
    (neighbors.py), so agreement on far candidates is irrelevant — counting
    them (as the r03 version of this gate did) underestimates the recall
    that actually matters by ~30 points."""
    relevant = exact_sq[:, :k] < radius_sq  # (M, k)
    hits = (idx[:, None, :k] == exact_idx[:, :k, None]).any(-1) & relevant
    denom = max(int(relevant.sum()), 1)
    return float(hits.sum()) / denom


def dist_recall_vs_exact(approx_sq, exact_sq, radius_sq, stride=17, tol=1e-6):
    """Distance-profile recall: fraction of exact within-radius neighbor
    distances matched by the approx set (row-wise sorted multiset match).
    Tie-aware — a returned neighbor at the same distance as a missed one is
    functionally equivalent downstream."""
    tot, hit = 0, 0
    for i in range(0, approx_sq.shape[0], stride):
        e = np.sort(exact_sq[i][exact_sq[i] < radius_sq])
        a = np.sort(approx_sq[i][approx_sq[i] < radius_sq])
        tot += len(e)
        j = 0
        for x in e:
            while j < len(a) and a[j] < x - tol:
                j += 1
            if j < len(a) and abs(a[j] - x) <= tol:
                hit += 1
                j += 1
    return hit / max(tot, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inner", type=int, default=20)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from config import make_cfg
    from ref_geotransformer_tpu.data import pad_points
    from ref_geotransformer_tpu.data.pyramid import build_pyramid
    from ref_geotransformer_tpu.ops import selection
    from ref_geotransformer_tpu.ops.pairwise import pairwise_distance

    cfg = make_cfg(demo=True)
    caps = cfg.capacities.points
    nls = cfg.capacities.neighbor_limits
    k = nls[0]
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    ref_raw = np.load(osp.join(root, "data", "demo", "ref.npy")).astype(np.float32)
    p0_np, m0_np = pad_points(ref_raw, caps[0])
    p0, m0 = jnp.array(p0_np), jnp.array(m0_np)
    n = caps[0]
    results = {"n": n, "k": int(k), "variants": {}}

    # ---- baseline: chunked approx_min_k (the shipped path) ----
    def baseline(p, recall):
        chunks = p.reshape(-1, 2048, 3)

        def body(q):
            sq = pairwise_distance(q, p)
            sq = jnp.where(~m0[None, :], 1e12, sq)
            return selection.min_k(sq, k, recall_target=recall)

        d, i = jax.lax.map(body, chunks)
        return d.reshape(n, k), i.reshape(n, k)

    # exact oracle (once, not timed)
    print("computing exact oracle (exact top-k)...", flush=True)

    def exact(p):
        chunks = p.reshape(-1, 2048, 3)

        def body(q):
            sq = pairwise_distance(q, p)
            sq = jnp.where(~m0[None, :], 1e12, sq)
            neg, i = jax.lax.top_k(-sq, k)
            return -neg, i

        d, i = jax.lax.map(body, chunks)
        return d.reshape(n, k), i.reshape(n, k)

    exact_d, exact_idx = (np.array(x) for x in jax.jit(exact)(p0))
    # the L0 search radius: what radius_search masks against downstream
    radius_sq = float(cfg.backbone.init_radius) ** 2
    n_relevant = int((exact_d < radius_sq).sum())
    print(f"within-radius exact neighbors: {n_relevant} "
          f"({n_relevant / (n * k):.3f} of all slots)", flush=True)

    for recall in (0.90, 0.95):
        name = f"baseline_approx_{recall}"
        ms = scan_timeit(name, lambda p, r=recall: baseline(p, r)[0], p0, inner=args.inner)
        d_a, idx = (np.array(x) for x in jax.jit(lambda p, r=recall: baseline(p, r))(p0))
        rec = recall_vs_exact(idx, exact_idx, exact_d, radius_sq, k)
        drec = dist_recall_vs_exact(d_a, exact_d, radius_sq)
        print(f"  index recall: {rec:.4f}  distance-profile recall: {drec:.4f}")
        results["variants"][name] = {"ms": ms, "index_recall": rec, "dist_recall": drec}

    # ---- shuffled-support baseline: approx_min_k's recall contract assumes
    # minima spread uniformly over the reduced axis, but our clouds are
    # spatially sorted (scan order / voxel-key order), so a query's true
    # neighbors are CONTIGUOUS — adversarial binning (measured 0.49 recall
    # at target 0.90). A static support permutation restores the contract.
    perm = jnp.array(np.random.default_rng(0).permutation(n))
    p_sh = p0[perm]
    m_sh = m0[perm]

    def baseline_shuffled(p, recall):
        chunks = p.reshape(-1, 2048, 3)

        def body(q):
            sq = pairwise_distance(q, p_sh)
            sq = jnp.where(~m_sh[None, :], 1e12, sq)
            d, i = selection.min_k(sq, k, recall_target=recall)
            return d, perm[i]

        d, i = jax.lax.map(body, chunks)
        return d.reshape(n, k), i.reshape(n, k)

    for recall in (0.90, 0.95):
        name = f"baseline_shuffled_{recall}"
        ms = scan_timeit(name, lambda p, r=recall: baseline_shuffled(p, r)[0], p0, inner=args.inner)
        d_a, idx = (np.array(x) for x in jax.jit(lambda p, r=recall: baseline_shuffled(p, r))(p0))
        rec = recall_vs_exact(idx, exact_idx, exact_d, radius_sq, k)
        drec = dist_recall_vs_exact(d_a, exact_d, radius_sq)
        print(f"  index recall: {rec:.4f}  distance-profile recall: {drec:.4f}")
        results["variants"][name] = {"ms": ms, "index_recall": rec, "dist_recall": drec}

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
