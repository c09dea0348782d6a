"""A/B quality validation of approximate selection + bf16 on real hardware
(VERDICT round-1 item 2).

The framework's TPU defaults make two numerical approximations the reference
never makes:
  * `lax.approx_min_k/max_k` (recall 0.95) for neighbor tables, patch
    selection, and the dense correspondence top-C (ops/selection.py) — on
    CPU these lower to exact sorts, so only TPU runs see the approximation;
  * optional bf16 KPConv aggregation (backbone.dtype).

This tool measures what those approximations do to model quality: it trains
one model (default settings) on a fixed synthetic-pair stream, then for each
of {approx, exact} x {float32, bfloat16} runs — in a subprocess, because the
selection switch is import-time static — (a) eval metrics of the SAME
trained weights on held-out pairs, and (b) a 30-step train-loss trajectory
from the SAME init on the SAME stream. Prints a markdown table; paste into
DESIGN.md.

Usage: python tools/ab_quality.py               # full A/B (4 subprocesses)
       python tools/ab_quality.py --train_steps 60 --scale 1.0
"""

import argparse
import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

CKPT = "/tmp/ab_quality_ckpt.pkl"


_BUILDER_CACHE = {}


def _pair_builder(cfg):
    """One jitted pyramid builder per capacity tuple — eager op-by-op
    dispatch over the device tunnel costs minutes per pair otherwise."""
    import jax

    from ref_geotransformer_tpu.data import build_registration_inputs

    key = (cfg.capacities.points, cfg.capacities.neighbor_limits, cfg.capacities.search_chunk)
    if key not in _BUILDER_CACHE:
        _BUILDER_CACHE[key] = jax.jit(
            lambda rp, rm, sp, sm, gt: build_registration_inputs(
                rp, rm, sp, sm,
                cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
                cfg.capacities.neighbor_limits, cfg.capacities.points,
                transform=gt, search_chunk=cfg.capacities.search_chunk,
            )
        )
    return _BUILDER_CACHE[key]


def make_pair(cfg, seed):
    """Synthetic partially-overlapping surface pair at full capacities."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from ref_geotransformer_tpu.data import pad_points

    rng = np.random.default_rng(seed)
    cap0 = cfg.capacities.points[0]
    n = cap0 * 3 // 4
    base = rng.uniform(-1.5, 1.5, (n * 2, 3)).astype(np.float32)
    base[:, 2] = 0.3 * np.sin(3 * base[:, 0]) + 0.2 * np.cos(2 * base[:, 1]) + 0.05 * base[:, 1] ** 2

    rot = Rotation.from_euler("xyz", rng.uniform(-40, 40, 3), degrees=True).as_matrix().astype(np.float32)
    t = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = rot
    gt[:3, 3] = t

    ref_raw = base[rng.choice(n * 2, n, replace=False)]
    src_sel = base[rng.choice(int(n * 1.4), n, replace=False)]  # ~70% overlap support
    src_raw = ((src_sel - t) @ rot).astype(np.float32)
    ref_raw = ref_raw + rng.normal(0, 0.005, ref_raw.shape).astype(np.float32)
    src_raw = src_raw + rng.normal(0, 0.005, src_raw.shape).astype(np.float32)

    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)
    return _pair_builder(cfg)(
        jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m), jnp.array(gt)
    )


def setup(scale, dtype):
    import dataclasses

    import jax

    import __graft_entry__ as g

    cfg, model, variables, _ = g._flagship_setup(scale=scale)
    if dtype != cfg.backbone.dtype:
        cfg = cfg.replace(backbone=dataclasses.replace(cfg.backbone, dtype=dtype))
        from ref_geotransformer_tpu.models import GeoTransformer

        model = GeoTransformer(cfg)
    return cfg, model, variables


def save_tree(path, trees):
    import jax

    with open(path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, trees), f)


def load_tree(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def phase_train(args):
    import jax

    from ref_geotransformer_tpu.engine import create_train_state, make_train_step

    cfg, model, variables = setup(args.scale, "float32")
    pairs = [make_pair(cfg, s) for s in range(args.n_train_pairs)]
    state, _ = create_train_state(model, pairs[0], cfg.optim, steps_per_epoch=args.train_steps,
                                  rng=jax.random.key(0))
    init_params = state.params
    step = make_train_step(model, cfg, donate=False)
    rng = jax.random.key(1)
    for i in range(args.train_steps):
        batch = jax.tree_util.tree_map(lambda x: x[None], pairs[i % len(pairs)])
        rng, sub = jax.random.split(rng)
        state, losses = step(state, batch, sub)
        if (i + 1) % 20 == 0:
            print(f"[train] step {i+1}/{args.train_steps} loss {float(losses['loss']):.4f}", flush=True)
    save_tree(CKPT, {"init": init_params, "trained": state.params, "buffers": state.buffers})
    print(f"[train] saved {CKPT}", flush=True)


def phase_measure(args):
    import jax

    from ref_geotransformer_tpu.engine import create_train_state, make_eval_step, make_train_step
    from ref_geotransformer_tpu.ops import selection

    cfg, model, variables = setup(args.scale, args.dtype)
    trees = load_tree(CKPT)

    state, _ = create_train_state(model, make_pair(cfg, 0), cfg.optim, steps_per_epoch=30,
                                  rng=jax.random.key(0))
    state = state.replace(params=jax.tree_util.tree_map(jnp_array, trees["trained"]),
                          buffers=jax.tree_util.tree_map(jnp_array, trees["buffers"]))

    eval_step = make_eval_step(model, cfg)
    boards = []
    for s in range(100, 100 + args.n_eval_pairs):
        batch = jax.tree_util.tree_map(lambda x: x[None], make_pair(cfg, s))
        boards.append({k: float(v) for k, v in jax.device_get(eval_step(state, batch)).items()})
    eval_mean = {k: round(float(np.mean([b[k] for b in boards])), 4)
                 for k in ("PIR", "IR", "RRE", "RTE", "RR")}

    # trajectory from the shared init on the shared stream
    state = state.replace(params=jax.tree_util.tree_map(jnp_array, trees["init"]))
    step = make_train_step(model, cfg, donate=False)
    pairs = [make_pair(cfg, s) for s in range(args.n_train_pairs)]
    rng = jax.random.key(1)
    traj = []
    for i in range(30):
        batch = jax.tree_util.tree_map(lambda x: x[None], pairs[i % len(pairs)])
        rng, sub = jax.random.split(rng)
        state, losses = step(state, batch, sub)
        traj.append(round(float(losses["loss"]), 5))

    print("ABRESULT " + json.dumps({
        "setting": f"{'exact' if selection.EXACT else 'approx'}-{args.dtype}",
        "eval": eval_mean,
        "loss_first5": traj[:5],
        "loss_last5": traj[-5:],
        "loss_mean_last10": round(float(np.mean(traj[-10:])), 5),
    }), flush=True)


def phase_forward(args):
    """Single forward with the trained weights under the CURRENT selection
    mode/dtype; dump intermediates for cross-setting drift comparison (a
    noise-free view of what approx selection / bf16 actually perturb)."""
    import jax

    cfg, model, _ = setup(args.scale, args.dtype)
    trees = load_tree(CKPT)
    variables = {"params": jax.tree_util.tree_map(jnp_array, trees["trained"]),
                 "buffers": jax.tree_util.tree_map(jnp_array, trees["buffers"])}

    fwd = jax.jit(lambda v, d: model.apply(v, d))
    dumps = {}
    for s in (100, 101, 102, 103):
        out = fwd(variables, make_pair(cfg, s))
        dumps[s] = {k: np.asarray(jax.device_get(out[k]), np.float32) for k in
                    ("ref_feats_c", "src_feats_c", "matching_scores", "estimated_transform",
                     "ref_corr_points", "src_corr_points", "corr_scores")}
    with open(args.out, "wb") as f:
        pickle.dump(dumps, f)
    print(f"[forward] dumped {args.out}", flush=True)


def compare_forward_dumps(path_a, path_b, name_a, name_b):
    """Drift metrics between two phase_forward dumps."""
    from ref_geotransformer_tpu.utils.registration import compute_registration_error

    with open(path_a, "rb") as f:
        da = pickle.load(f)
    with open(path_b, "rb") as f:
        db = pickle.load(f)
    rows = []
    for s in sorted(da):
        a, b = da[s], db[s]
        cos = float(np.mean(np.sum(a["ref_feats_c"] * b["ref_feats_c"], -1) / (
            np.linalg.norm(a["ref_feats_c"], axis=-1) * np.linalg.norm(b["ref_feats_c"], axis=-1) + 1e-12)))
        score_mad = float(np.mean(np.abs(a["matching_scores"] - b["matching_scores"])))
        rre, rte = compute_registration_error(a["estimated_transform"], b["estimated_transform"])
        rows.append({"pair": s, "feat_cos": round(cos, 6), "score_mad": round(score_mad, 6),
                     "d_rre_deg": round(float(rre), 4), "d_rte_m": round(float(rte), 5)})
    print(f"DRIFT {name_a} vs {name_b}: " + json.dumps(rows), flush=True)
    return rows


def jnp_array(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--phase", default="all", choices=["all", "train", "measure", "forward", "drift"])
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--train_steps", type=int, default=60)
    parser.add_argument("--n_train_pairs", type=int, default=8)
    parser.add_argument("--n_eval_pairs", type=int, default=8)
    parser.add_argument("--out", default="/tmp/ab_forward.pkl", help="forward-dump path (--phase forward)")
    args = parser.parse_args()

    if args.phase == "train":
        return phase_train(args)
    if args.phase == "measure":
        return phase_measure(args)
    if args.phase == "forward":
        return phase_forward(args)
    if args.phase == "drift":
        # orchestrate forward dumps across settings, then compare
        base_cmd = [sys.executable, osp.abspath(__file__), "--scale", str(args.scale),
                    "--phase", "forward"]
        settings = [("0", "float32"), ("1", "float32"), ("0", "bfloat16"), ("1", "bfloat16")]
        paths = {}
        for exact, dtype in settings:
            name = f"{'exact' if exact == '1' else 'approx'}-{dtype}"
            paths[name] = f"/tmp/ab_forward_{name}.pkl"
            env = dict(os.environ, REF_GT_EXACT_SELECT=exact)
            subprocess.run(base_cmd + ["--dtype", dtype, "--out", paths[name]], env=env, check=True)
        compare_forward_dumps(paths["approx-float32"], paths["exact-float32"],
                              "approx-f32", "exact-f32")
        compare_forward_dumps(paths["approx-bfloat16"], paths["exact-bfloat16"],
                              "approx-bf16", "exact-bf16")
        compare_forward_dumps(paths["exact-bfloat16"], paths["exact-float32"],
                              "exact-bf16", "exact-f32")
        return None

    # orchestrate
    base_cmd = [sys.executable, osp.abspath(__file__), "--scale", str(args.scale),
                "--train_steps", str(args.train_steps),
                "--n_train_pairs", str(args.n_train_pairs), "--n_eval_pairs", str(args.n_eval_pairs)]
    subprocess.run(base_cmd + ["--phase", "train"], check=True)
    rows = []
    for exact in ("0", "1"):
        for dtype in ("float32", "bfloat16"):
            env = dict(os.environ, REF_GT_EXACT_SELECT=exact)
            out = subprocess.run(base_cmd + ["--phase", "measure", "--dtype", dtype],
                                 env=env, capture_output=True, text=True)
            sys.stderr.write(out.stderr[-2000:])
            for line in out.stdout.splitlines():
                if line.startswith("ABRESULT "):
                    rows.append(json.loads(line[len("ABRESULT "):]))
                else:
                    print(line)
            if out.returncode != 0:
                raise SystemExit(f"measure {exact}/{dtype} failed")

    print("\n| setting | PIR | IR | RRE | RTE | RR | train loss (mean last 10) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        e = r["eval"]
        print(f"| {r['setting']} | {e['PIR']} | {e['IR']} | {e['RRE']} | {e['RTE']} | {e['RR']} | {r['loss_mean_last10']} |")
    print("\n" + json.dumps(rows))


if __name__ == "__main__":
    main()
