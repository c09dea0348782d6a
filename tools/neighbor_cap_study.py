"""Neighbor-cap sensitivity study (VERDICT r04 item 7).

The per-level neighbor limits bound the KPConv gather volume — the measured
backbone floor is ∝ H (DESIGN.md §6.3) — so tightening them is a direct e2e
lever. But they also truncate genuine within-radius neighborhoods, the same
trade the reference's keep_ratio-0.8 calibration makes
(/root/reference/geotransformer/utils/data.py:196-221).

This tool quantifies the quality side on the real 3DMatch demo pair: for each
candidate cap vector it reports, per pyramid level,
  * keep_ratio   — fraction of points whose ENTIRE within-radius neighbor set
                   fits under the cap (the reference's calibration statistic);
  * mass_kept    — fraction of all within-radius neighbor slots retained
                   (sum min(count, cap) / sum count) — what the conv actually
                   loses, since neighbors are distance-sorted and the dropped
                   ones are the farthest.
Speed side: BENCH chain (REF_GT_NEIGHBOR_LIMITS=...). Quality-trajectory
side: tools/overfit_probe.py under the same env. All three go to DESIGN.md.

Usage: python tools/neighbor_cap_study.py            # CPU is fine
"""

import argparse
import json
import os.path as osp
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "experiments", "geotransformer_3dmatch_stage4"))


def level_histograms(full: bool = True, max_limit: int = 128):
    """Per-level within-radius neighbor-count histograms for the demo pair,
    computed with the SAME device kernels the runtime uses."""
    import jax
    import jax.numpy as jnp

    from config import make_cfg
    from ref_geotransformer_tpu.data.pyramid import pad_points
    from ref_geotransformer_tpu.ops.neighbors import _chunked_topk_neighbors
    from ref_geotransformer_tpu.ops.subsample import grid_subsample

    cfg = make_cfg(demo=not full)
    num_stages = cfg.backbone.num_stages
    hists = np.zeros((num_stages, max_limit + 1), np.int64)

    count_fn = jax.jit(
        lambda q, s, sm, r: jnp.sum(
            _chunked_topk_neighbors(q, s, sm, max_limit, 1024)[0] < r * r, axis=1
        )
    )

    for side in ("ref", "src"):
        pts = np.load(osp.join(ROOT, "data", "demo", f"{side}.npy")).astype(np.float32)
        pts = pts[: cfg.capacities.points[0]]
        padded, masks = pad_points(pts, cfg.capacities.points[0])
        cur_p, cur_m = jnp.array(padded), jnp.array(masks)
        v, r = cfg.backbone.init_voxel_size, cfg.backbone.init_radius
        for lvl in range(num_stages):
            if lvl > 0:
                v *= 2.0
                cur_p, cur_m = grid_subsample(cur_p, cur_m, v, cfg.capacities.points[lvl])
            counts = np.asarray(count_fn(cur_p, cur_p, cur_m, r))[np.asarray(cur_m)]
            hists[lvl] += np.bincount(np.minimum(counts, max_limit), minlength=max_limit + 1)
            r *= 2.0
    return hists


def cap_stats(hists: np.ndarray, caps) -> dict:
    per_level = []
    for lvl, cap in enumerate(caps):
        h = hists[lvl]
        n = np.arange(len(h))
        total_pts = h.sum()
        total_mass = (h * n).sum()
        keep_ratio = h[: cap + 1].sum() / max(total_pts, 1)
        mass_kept = (h * np.minimum(n, cap)).sum() / max(total_mass, 1)
        per_level.append(
            {"cap": int(cap), "keep_ratio": round(float(keep_ratio), 4),
             "mass_kept": round(float(mass_kept), 4)}
        )
    return {"caps": list(map(int, caps)), "levels": per_level,
            "min_keep_ratio": min(l["keep_ratio"] for l in per_level),
            "min_mass_kept": min(l["mass_kept"] for l in per_level)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true", help="demo caps instead of full")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--caps", nargs="*", default=["38,36,36,38", "32,28,28,32", "28,24,24,28", "24,20,20,24"]
    )
    args = ap.parse_args()

    hists = level_histograms(full=not args.demo)
    rows = [cap_stats(hists, tuple(int(x) for x in c.split(","))) for c in args.caps]
    payload = {"tool": "neighbor_cap_study", "regime": "demo" if args.demo else "full",
               "candidates": rows}
    print(json.dumps(payload, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
