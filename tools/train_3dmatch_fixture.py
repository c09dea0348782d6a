"""End-to-end 3DMatch experiment CLI exercise on a synthetic fixture tree:
real `trainval.py` (epoch trainer + val + snapshots) -> `test.py` (feature
dumps) -> `eval.py` (scene-wise benchmark protocol, lgr + svd), all as
subprocesses of the ACTUAL experiment scripts — the same flow a user runs
on the real dataset (reference README.md:168-204), sized down via
REF_GT_CAPS_SCALE and pointed at the fixture via REF_GT_3DMATCH_ROOT.

Usage: python tools/train_3dmatch_fixture.py [--epochs 2] [--scale 0.1]
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
EXP_DIR = osp.join(ROOT, "experiments", "geotransformer_3dmatch_stage4")


def _surface(rng, n):
    pts = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    pts[:, 2] = (0.3 * np.sin(2.2 * pts[:, 0]) + 0.25 * np.cos(1.7 * pts[:, 1])
                 + 0.15 * pts[:, 0] * pts[:, 1])
    return pts


def _transform(rng):
    from scipy.spatial.transform import Rotation

    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rotation.from_euler("xyz", rng.uniform(-30, 30, 3), degrees=True).as_matrix()
    t[:3, 3] = rng.uniform(-0.3, 0.3, 3)
    return t


def make_fixture_tree(root, n_train=4, n_val=2, points=2400, val_from_train=False,
                      real_base=None):
    """torch-saved .pth fragments + metadata pkls + val benchmark gt files
    (the reference's on-disk layout, threedmatch/dataset.py:52-66).

    real_base: optional list of .npy cloud paths — fragments become random
    subsets of REAL scans instead of synthetic height-field surfaces.
    Smooth synthetic surfaces are geometrically self-similar, which starves
    the coarse matching supervision; real indoor geometry overfits much
    faster (the regime OVERFIT_PROBE_r03.json proved)."""
    import torch

    from ref_geotransformer_tpu.data.benchmark_3dmatch import write_log_file

    scene = "7-scenes-fixture"
    rng = np.random.default_rng(5)
    if osp.isdir(root):
        shutil.rmtree(root)
    os.makedirs(osp.join(root, "metadata"))
    bases = [np.load(p).astype(np.float32) for p in real_base] if real_base else None

    def build_split(split, pairs):
        os.makedirs(osp.join(root, "data", split, scene), exist_ok=True)
        metadata = []
        for pair_i, (frag0, frag1) in enumerate(pairs):
            gt = _transform(rng)
            if bases is not None:
                base = bases[pair_i % len(bases)]
            else:
                base = _surface(rng, int(points * 1.3))
            ref = base[rng.permutation(len(base))[:points]]
            src_sel = base[rng.permutation(len(base))[:points]]
            src = (src_sel - gt[:3, 3]) @ gt[:3, :3]
            ref = ref + rng.normal(0, 0.004, ref.shape).astype(np.float32)
            src = (src + rng.normal(0, 0.004, src.shape)).astype(np.float32)
            pcd0 = f"{split}/{scene}/cloud_bin_{frag0}.pth"
            pcd1 = f"{split}/{scene}/cloud_bin_{frag1}.pth"
            torch.save(torch.from_numpy(ref.astype(np.float32)), osp.join(root, "data", pcd0))
            torch.save(torch.from_numpy(src), osp.join(root, "data", pcd1))
            metadata.append({
                "scene_name": scene, "frag_id0": frag0, "frag_id1": frag1,
                "overlap": 0.75, "rotation": gt[:3, :3], "translation": gt[:3, 3],
                "pcd0": pcd0, "pcd1": pcd1,
            })
        with open(osp.join(root, "metadata", f"{split}.pkl"), "wb") as f:
            pickle.dump(metadata, f)
        return metadata

    # train pairs (2i, 2i+1) keep every fragment id unique; val reuses ids in
    # a disjoint split dir so frame naming stays benchmark-compatible
    train_meta = build_split("train", [(2 * i, 2 * i + 1) for i in range(n_train)])
    if val_from_train:
        # overfit-probe mode: the val/benchmark pairs ARE the train pairs
        # (the reference's own correctness-probe pattern, modelnet
        # dataset.py:64,92-98) — copy fragments into the val split dir.
        # Remap fragment ids to (3i, 3i+2): the benchmark RR protocol only
        # scores NON-consecutive pairs (reference threedmatch/utils.py
        # evaluate_registration_one_scene; benchmark_3dmatch.py:162), so
        # gap-1 ids would leave RR with an empty denominator.
        os.makedirs(osp.join(root, "data", "val", scene), exist_ok=True)
        val_meta = []
        for i, m in enumerate(train_meta[:n_val]):
            vm = dict(m)
            vm["frag_id0"], vm["frag_id1"] = 3 * i, 3 * i + 2
            for key, fid in (("pcd0", vm["frag_id0"]), ("pcd1", vm["frag_id1"])):
                dst = f"val/{scene}/cloud_bin_{fid}.pth"
                shutil.copyfile(osp.join(root, "data", m[key]), osp.join(root, "data", dst))
                vm[key] = dst
            val_meta.append(vm)
        with open(osp.join(root, "metadata", "val.pkl"), "wb") as f:
            pickle.dump(val_meta, f)
    else:
        val_meta = build_split("val", [(0, 3), (1, 5)][:n_val])

    # "val" doubles as a benchmark: gt.log + covariance gt.info
    bench_dir = osp.join(root, "metadata", "benchmarks", "val", scene)
    os.makedirs(bench_dir)
    gt_pairs = []
    info_lines = []
    num_fragments = 10
    for m in val_meta:
        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = m["rotation"]
        t[:3, 3] = m["translation"]
        gt_pairs.append({"test_pair": [m["frag_id0"], m["frag_id1"]],
                         "num_fragments": num_fragments, "transform": t})
        info_lines.append((m["frag_id0"], m["frag_id1"]))
    write_log_file(osp.join(bench_dir, "gt.log"), gt_pairs)
    cov = np.eye(6, dtype=np.float32)
    with open(osp.join(bench_dir, "gt.info"), "w") as f:
        for a, b in info_lines:
            f.write(f"{a}\t{b}\t{num_fragments}\n")
            for row in cov:
                f.write("\t".join(str(x) for x in row) + "\n")


def run(cmd, env):
    print("$ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        raise SystemExit(f"step failed: {' '.join(cmd)}")
    return proc.stdout


def _parse_summary(stdout: str) -> dict:
    """eval.py prints a python dict as its last line; parse it."""
    import ast

    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return ast.literal_eval(line)
    return {}


def _parse_val_lines(log_path: str) -> list:
    """Extract the per-epoch '[Val] ...' metric lines from train.log."""
    if not osp.isfile(log_path):
        return []
    with open(log_path) as f:
        return [line.split("[Val]", 1)[1].strip() for line in f if "[Val]" in line]


def drive(root: str, epochs: int, scale: float, *, reuse_tree: bool = False,
          resume: bool = False, train_pairs: int = 4, overfit: bool = False,
          points: int = 2400, val_every: int = 10, real: bool = False,
          skip_train: bool = False) -> dict:
    """Run the full trainval -> test -> eval CLI stack; returns parsed
    metrics (eval summaries per method + per-epoch val log lines).

    overfit=True is the train-to-registration probe: val == train pairs,
    constant LR, no augmentation, all pairs in one global batch (the regime
    OVERFIT_PROBE_r03.json proved converges) — the stack must drive eval RR
    to ~1."""
    if not (reuse_tree and osp.isdir(osp.join(root, "metadata"))):
        real_base = None
        if real:
            real_base = [osp.join(ROOT, "data", "demo", "ref.npy"),
                         osp.join(ROOT, "data", "demo", "src.npy")]
        make_fixture_tree(root, n_train=train_pairs, n_val=min(2, train_pairs) if overfit else 2,
                          val_from_train=overfit, points=points, real_base=real_base)
    out_root = osp.join(root, "output")
    env = dict(os.environ,
               REF_GT_3DMATCH_ROOT=root,
               REF_GT_OUTPUT_ROOT=out_root,
               REF_GT_CAPS_SCALE=str(scale))
    if overfit:
        env.update(REF_GT_LR_DECAY="1.0", REF_GT_USE_AUG="0",
                   REF_GT_VAL_EVERY=str(val_every))
    # keep the persistent XLA cache shared across fixture roots (OUTPUT_ROOT
    # would otherwise redirect it to a throwaway dir)
    env.setdefault("REF_GT_COMPILE_CACHE", osp.expanduser("~/.cache/ref_gt_xla"))

    py = sys.executable
    # pin batch_size: the default is max(cfg batch, jax.device_count()), and
    # a CI parent's xla_force_host_platform_device_count=8 would leak into
    # the subprocess and overshoot the tiny fixture (empty drop_last loader)
    train_cmd = [py, osp.join(EXP_DIR, "trainval.py"), "--max_epoch", str(epochs),
                 "--log_steps", "1", "--num_devices", "1",
                 "--batch_size", str(train_pairs if overfit else 1)]
    if resume:
        train_cmd.append("--resume")
    if not skip_train:
        run(train_cmd, env)
    run([py, osp.join(EXP_DIR, "test.py"), "--snapshot", f"epoch-{epochs}",
         "--benchmark", "val"], env)
    out_lgr = run([py, osp.join(EXP_DIR, "eval.py"), "--benchmark", "val", "--method", "lgr"], env)
    out_svd = run([py, osp.join(EXP_DIR, "eval.py"), "--benchmark", "val", "--method", "svd"], env)

    exp_out = osp.join(out_root, osp.basename(EXP_DIR))
    return {
        "ok": True,
        "epochs": epochs,
        "scale": scale,
        "eval_lgr": _parse_summary(out_lgr),
        "eval_svd": _parse_summary(out_svd),
        "val_log": _parse_val_lines(osp.join(exp_out, "logs", "train.log")),
        "snapshot_dir": osp.join(exp_out, "snapshots"),
        "feature_dir": osp.join(exp_out, "features"),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--scale", type=float, default=0.1)
    parser.add_argument("--root", default="/tmp/threedmatch_fixture")
    parser.add_argument("--reuse_tree", action="store_true",
                        help="keep an existing fixture tree (continue training)")
    parser.add_argument("--resume", action="store_true", help="resume trainval from snapshot")
    parser.add_argument("--train_pairs", type=int, default=4,
                        help="fixture train pairs (more pairs = more steps/epoch)")
    parser.add_argument("--overfit", action="store_true",
                        help="train-to-registration probe: val==train, constant LR, no aug")
    parser.add_argument("--points", type=int, default=2400, help="points per fixture fragment")
    parser.add_argument("--val_every", type=int, default=10,
                        help="overfit mode: validate every N epochs")
    parser.add_argument("--real", action="store_true",
                        help="build fragments from the real demo scans instead of synthetic surfaces")
    parser.add_argument("--skip_train", action="store_true",
                        help="rerun only test.py + eval.py on existing snapshots (needs --reuse_tree)")
    parser.add_argument("--out", default=None, help="write the parsed metrics JSON here")
    args = parser.parse_args()

    result = drive(args.root, args.epochs, args.scale, reuse_tree=args.reuse_tree,
                   resume=args.resume, train_pairs=args.train_pairs, overfit=args.overfit,
                   points=args.points, val_every=args.val_every, real=args.real,
                   skip_train=args.skip_train)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
