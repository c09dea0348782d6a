"""Single-pair demo: load data/demo/{ref,src,gt}.npy, run the full jitted
pipeline (on-device pyramid build + model + LGR), report RRE/RTE/RMSE.

Ref parity: experiments/geotransformer.3dmatch.../demo.py:44-87 — but the
whole compute path (including the reference's CPU collate) is one jit, and
there is no open3d visualization dependency (outputs can be dumped to .npz
with --dump for external viewers).

With random weights the transform is meaningless; pass --snapshot to load a
trained checkpoint. This script is the minimum end-to-end slice.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

from config import make_cfg


def parse_args():
    parser = argparse.ArgumentParser()
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    parser.add_argument("--ref_file", default=osp.join(root, "data", "demo", "ref.npy"))
    parser.add_argument("--src_file", default=osp.join(root, "data", "demo", "src.npy"))
    parser.add_argument("--gt_file", default=osp.join(root, "data", "demo", "gt.npy"))
    parser.add_argument("--snapshot", default=None, help="checkpoint dir (orbax) to load")
    parser.add_argument("--dump", default=None, help="dump outputs to this .npz")
    parser.add_argument("--iters", type=int, default=1, help="timing iterations")
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
    from ref_geotransformer_tpu.models import GeoTransformer, init_model_variables
    from ref_geotransformer_tpu.models.losses import evaluate

    cfg = make_cfg(demo=True)

    ref_raw = np.load(args.ref_file).astype(np.float32)
    src_raw = np.load(args.src_file).astype(np.float32)
    gt = np.load(args.gt_file).astype(np.float32)

    cap0 = cfg.capacities.points[0]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)

    @jax.jit
    def build(ref_p, ref_m, src_p, src_m, gt):
        return build_registration_inputs(
            ref_p, ref_m, src_p, src_m,
            cfg.backbone.num_stages,
            cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius,
            cfg.capacities.neighbor_limits,
            cfg.capacities.points,
            transform=gt,
            search_chunk=cfg.capacities.search_chunk,
        )

    t0 = time.time()
    data = jax.block_until_ready(build(ref_p, ref_m, src_p, src_m, jnp.array(gt)))
    print(f"pyramid build: {time.time() - t0:.2f}s (incl. compile)")

    model = GeoTransformer(cfg)
    t0 = time.time()
    variables = init_model_variables(model, cfg, jax.random.key(0))
    print(f"init: {time.time() - t0:.2f}s")

    params, buffers = variables["params"], variables["buffers"]
    if args.snapshot:
        ckpt = CheckpointManager(osp.dirname(args.snapshot))
        restored = ckpt.load_model(osp.basename(args.snapshot), params, buffers)
        params, buffers = restored["params"], restored["buffers"]
        print(f"loaded snapshot {args.snapshot}")

    @jax.jit
    def forward(params, buffers, data):
        return model.apply({"params": params, "buffers": buffers}, data)

    t0 = time.time()
    out = jax.block_until_ready(forward(params, buffers, data))
    print(f"forward: {time.time() - t0:.2f}s (incl. compile)")

    if args.iters > 1:
        t0 = time.time()
        for _ in range(args.iters):
            out = forward(params, buffers, data)
        jax.device_get(out["estimated_transform"])  # force a real round-trip
        dt = (time.time() - t0) / args.iters
        print(f"steady-state forward: {dt * 1e3:.1f} ms/pair ({1.0 / dt:.2f} pairs/s)")

    metrics = jax.device_get(evaluate(out, data["transform"], cfg.eval))
    print("estimated transform:\n", np.asarray(out["estimated_transform"]))
    print("gt transform:\n", gt)
    print({k: float(v) for k, v in metrics.items()})

    if args.dump:
        np.savez_compressed(
            args.dump,
            estimated_transform=np.asarray(out["estimated_transform"]),
            ref_corr_points=np.asarray(out["ref_corr_points"]),
            src_corr_points=np.asarray(out["src_corr_points"]),
            corr_scores=np.asarray(out["corr_scores"]),
        )
        # before/after clouds for any PLY viewer (open3d-free)
        from ref_geotransformer_tpu.utils.visualization import dump_registration_ply

        prefix = args.dump[:-4] if args.dump.endswith(".npz") else args.dump
        dump_registration_ply(prefix, ref_raw, src_raw, np.asarray(out["estimated_transform"]))
        print(f"dumped outputs to {args.dump} (+ {prefix}_*.ply)")


if __name__ == "__main__":
    main()
