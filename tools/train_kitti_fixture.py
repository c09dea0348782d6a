"""End-to-end KITTI experiment CLI exercise on a synthetic fixture tree:
real `trainval.py` -> `test.py` (npz feature dumps) -> `eval.py` (lgr + svd),
all as subprocesses of the ACTUAL kitti_stage5 experiment scripts — the flow
a user runs on the real odometry benchmark (reference README.md:217-236) —
sized down via REF_GT_CAPS_SCALE and pointed at the fixture via
REF_GT_KITTI_ROOT. Mirrors tools/train_3dmatch_fixture.py.

Usage: python tools/train_kitti_fixture.py [--epochs 2] [--scale 0.1]
"""

import argparse
import json
import os
import os.path as osp
import pickle
import shutil
import subprocess
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
EXP_DIR = osp.join(ROOT, "experiments", "geotransformer_kitti_stage5")


def _scan(rng, n=1800, radius=10.0):
    """Synthetic LiDAR-ish scan: ground annulus + a few vertical structures,
    meters-scale like the 0.3 m-voxel odometry scans."""
    n_ground = int(n * 0.7)
    r = np.sqrt(rng.uniform(1.0, 1.0 + radius**2, n_ground) - 1.0)
    th = rng.uniform(0, 2 * np.pi, n_ground)
    ground = np.stack([r * np.cos(th), r * np.sin(th), rng.normal(0, 0.05, n_ground)], axis=1)
    structures = []
    for _ in range(6):
        cx, cy = rng.uniform(-radius * 0.8, radius * 0.8, 2)
        w = rng.uniform(0.5, 2.0)
        m = (n - n_ground) // 6
        structures.append(np.stack([
            cx + rng.uniform(-w, w, m),
            cy + rng.uniform(-w, w, m),
            rng.uniform(0.0, 3.0, m),
        ], axis=1))
    return np.concatenate([ground] + structures, axis=0).astype(np.float32)


def _transform(rng):
    """Odometry-like motion: yaw + small pitch/roll, few-meter translation."""
    from scipy.spatial.transform import Rotation

    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rotation.from_euler(
        "zyx", [rng.uniform(-20, 20), rng.uniform(-2, 2), rng.uniform(-2, 2)], degrees=True
    ).as_matrix()
    t[:3, 3] = [rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(-0.2, 0.2)]
    return t


def make_fixture_tree(root, pairs_per_split=((("00", 2), ("01", 2)), (("06", 2),), (("08", 2),))):
    """npy scans + metadata pkls in the reader's on-disk layout
    (data/datasets/kitti.py:60-122: metadata[pcd0/pcd1/seq_id/frame0/frame1/
    transform], clouds as float32 .npy)."""
    rng = np.random.default_rng(11)
    if osp.isdir(root):
        shutil.rmtree(root)
    os.makedirs(osp.join(root, "metadata"))

    for split, seqs in zip(("train", "val", "test"), pairs_per_split):
        metadata = []
        for seq_id, n_pairs in seqs:
            os.makedirs(osp.join(root, "downsampled", seq_id), exist_ok=True)
            for k in range(n_pairs):
                frame0, frame1 = 2 * k, 2 * k + 1
                gt = _transform(rng)
                base = _scan(rng)
                ref = base + rng.normal(0, 0.01, base.shape).astype(np.float32)
                # ref ~= gt @ src: src lives in the earlier frame
                sel = base[rng.permutation(len(base))[: int(len(base) * 0.9)]]
                src = ((sel - gt[:3, 3]) @ gt[:3, :3]).astype(np.float32)
                pcd0 = f"downsampled/{seq_id}/{frame0:06d}.npy"
                pcd1 = f"downsampled/{seq_id}/{frame1:06d}.npy"
                np.save(osp.join(root, pcd0), ref.astype(np.float32))
                np.save(osp.join(root, pcd1), src)
                metadata.append({
                    "seq_id": seq_id, "frame0": frame0, "frame1": frame1,
                    "transform": gt, "pcd0": pcd0, "pcd1": pcd1,
                })
        with open(osp.join(root, "metadata", f"{split}.pkl"), "wb") as f:
            pickle.dump(metadata, f)


def run(cmd, env):
    print("$ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        raise SystemExit(f"step failed: {' '.join(cmd)}")
    return proc.stdout


def _parse_summary(stdout: str) -> dict:
    import ast

    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return ast.literal_eval(line)
    return {}


def drive(root: str, epochs: int, scale: float) -> dict:
    make_fixture_tree(root)
    out_root = osp.join(root, "output")
    env = dict(os.environ,
               REF_GT_KITTI_ROOT=root,
               REF_GT_OUTPUT_ROOT=out_root,
               REF_GT_CAPS_SCALE=str(scale))
    # keep the persistent XLA cache shared across fixture roots
    env.setdefault("REF_GT_COMPILE_CACHE", osp.expanduser("~/.cache/ref_gt_xla"))

    py = sys.executable
    # pin batch_size=1: the default is max(cfg batch, jax.device_count()),
    # and a CI parent's xla_force_host_platform_device_count=8 would leak
    # into the subprocess and overshoot the tiny fixture (empty loader)
    run([py, osp.join(EXP_DIR, "trainval.py"), "--max_epoch", str(epochs),
         "--log_steps", "1", "--batch_size", "1", "--num_devices", "1"], env)
    run([py, osp.join(EXP_DIR, "test.py"), "--snapshot", f"epoch-{epochs}"], env)
    out_lgr = run([py, osp.join(EXP_DIR, "eval.py"), "--method", "lgr"], env)
    out_svd = run([py, osp.join(EXP_DIR, "eval.py"), "--method", "svd"], env)

    exp_out = osp.join(out_root, osp.basename(EXP_DIR))
    return {
        "ok": True,
        "epochs": epochs,
        "scale": scale,
        "eval_lgr": _parse_summary(out_lgr),
        "eval_svd": _parse_summary(out_svd),
        "snapshot_dir": osp.join(exp_out, "snapshots"),
        "feature_dir": osp.join(exp_out, "features"),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--scale", type=float, default=0.1)
    parser.add_argument("--root", default="/tmp/kitti_fixture")
    parser.add_argument("--out", default=None, help="write the parsed metrics JSON here")
    args = parser.parse_args()

    result = drive(args.root, args.epochs, args.scale)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
