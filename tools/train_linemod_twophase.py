"""End-to-end LineMod two-phase training validation (VERDICT round-1 item 5).

Reproduces the reference's full modelnet.rpmnet.stage4 training flow
(reference engine/iter_based_trainer.py:322-391) on synthetic fixture data:

  phase 1: experiments/geotransformer_modelnet_rpmnet_stage4/trainval_encoder.py
           (IterBasedEncoderTrainer, N iters, snapshot + truncated val)
  phase 2: experiments/geotransformer_modelnet_rpmnet_stage4/train_cordi.py
           --encoder_snapshot iter-N  (frozen encoder -> Cordi DDPM,
           DDPMEvaluator val: PIR@32/16/8 + IIR)

Both phases run through the real experiment CLIs via subprocess, so the
snapshot handoff (--encoder_snapshot) is exercised exactly as a user would.
The synthetic BOP tree (box mesh + rendered depth planes + scene json) is
written to data/linemod (gitignored).

Usage: python tools/train_linemod_twophase.py [--encoder_iters 200]
       [--cordi_iters 100] [--keep_output]
Prints ONE JSON summary line and exits nonzero if either loss fails to
descend or the DDPM val metrics are missing.
"""

import argparse
import json
import os
import os.path as osp
import re
import shutil
import subprocess
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
EXP_DIR = osp.join(ROOT, "experiments", "geotransformer_modelnet_rpmnet_stage4")
DATA_ROOT = osp.join(ROOT, "data")
OUT_DIR = osp.join(ROOT, "output", "geotransformer_modelnet_rpmnet_stage4")


def make_synthetic_linemod_tree(base: str, n_train: int = 12, n_test: int = 4) -> None:
    """Synthesize a BOP-format LineMod tree: one box object, depth frames
    rendering the box's z=0 face at varied translations (BOP layout per
    reference datasets/registration/linemod/linemod.py:66-132)."""
    from PIL import Image

    if osp.exists(base):
        shutil.rmtree(base)
    os.makedirs(osp.join(base, "models"))

    # box mesh in mm (LineMod objects are ~5-15 cm)
    verts_mm = np.array([[x, y, z] for x in (0, 60) for y in (0, 80) for z in (0, 100)], np.float64)
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int64,
    )
    with open(osp.join(base, "models", "obj_000001.ply"), "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts_mm)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in verts_mm:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")

    h, w = 120, 160
    fx = fy = 500.0
    cx, cy = 80.0, 60.0
    rng = np.random.default_rng(0)

    for mode, n_frames in (("train", n_train), ("test", n_test)):
        frame_dir = osp.join(base, mode, "000001")
        os.makedirs(osp.join(frame_dir, "depth"))
        os.makedirs(osp.join(frame_dir, "mask_visib"))
        cams, gts = {}, {}
        for fid in range(n_frames):
            # identity rotation, varied translation; augmentation supplies
            # rotation diversity at load time (linemod.py __getitem__)
            tx = float(rng.uniform(-0.03, 0.01))
            ty = float(rng.uniform(-0.03, 0.01))
            tz = float(rng.uniform(0.6, 0.9))
            # the z=0 face (x in [0,60]mm, y in [0,80]mm) projects to a rect
            u0 = max(int(np.ceil(fx * tx / tz + cx)) + 1, 0)
            u1 = min(int(np.floor(fx * (tx + 0.060) / tz + cx)) - 1, w)
            v0 = max(int(np.ceil(fy * ty / tz + cy)) + 1, 0)
            v1 = min(int(np.floor(fy * (ty + 0.080) / tz + cy)) - 1, h)
            depth = np.zeros((h, w), np.uint16)
            mask = np.zeros((h, w), np.uint8)
            # mild surface relief so the cloud is not a perfect plane
            vv, uu = np.mgrid[v0:v1, u0:u1]
            relief = (2.0 * np.sin(uu / 7.0) * np.cos(vv / 9.0)).astype(np.int32)
            depth[v0:v1, u0:u1] = np.uint16(round(tz * 1000)) + relief.astype(np.uint16)
            mask[v0:v1, u0:u1] = 255
            Image.fromarray(depth).save(osp.join(frame_dir, "depth", f"{fid:06d}.png"))
            Image.fromarray(mask).save(osp.join(frame_dir, "mask_visib", f"{fid:06d}_000000.png"))
            cams[str(fid)] = {"cam_K": [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0], "depth_scale": 1.0}
            gts[str(fid)] = [{
                "cam_R_m2c": np.eye(3).flatten().tolist(),
                "cam_t_m2c": [tx * 1000, ty * 1000, tz * 1000],
                "obj_id": 1,
            }]
        with open(osp.join(frame_dir, "scene_camera.json"), "w") as f:
            json.dump(cams, f)
        with open(osp.join(frame_dir, "scene_gt.json"), "w") as f:
            json.dump(gts, f)


_LOSS_RE = re.compile(r"iter: (\d+)/\d+.*?(?<![\w_])loss: ([-\d.eE+]+)")


def parse_loss_trajectory(log_path: str):
    traj = []
    with open(log_path) as f:
        for line in f:
            if "[Val]" in line:
                continue
            m = _LOSS_RE.search(line)
            if m:
                traj.append((int(m.group(1)), float(m.group(2))))
    return traj


def parse_val_metrics(log_path: str, keys):
    """Last [Val] line's metrics."""
    out = {}
    with open(log_path) as f:
        for line in f:
            if "[Val]" not in line:
                continue
            for k in keys:
                m = re.search(rf"(?<![\w.]){re.escape(k)}: ([-\d.eE+]+)", line)
                if m:
                    out[k] = float(m.group(1))
    return out


def run_phase(script: str, extra_args, log_name: str, out_dir: str, env=None) -> str:
    cmd = [sys.executable, osp.join(EXP_DIR, script)] + extra_args
    print(f"[twophase] running: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True, env=env)
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-3000:])
    if proc.returncode != 0:
        raise SystemExit(f"{script} failed with code {proc.returncode}")
    return osp.join(out_dir, "logs", log_name)


def drive(encoder_iters: int = 200, cordi_iters: int = 100, *,
          data_root: str = None, out_root: str = None,
          keep_output: bool = False, snapshot_every: int = None,
          ddpm_steps: int = None) -> dict:
    """Run the full two-phase LineMod stack via the real CLIs; returns the
    parsed summary. data_root/out_root make it hermetic for test use
    (REF_GT_LINEMOD_ROOT / REF_GT_OUTPUT_ROOT env overrides); defaults are
    the repo's data/ and output/ like a user run."""
    env = dict(os.environ)
    base = osp.join(data_root or DATA_ROOT, "linemod")
    out_dir = OUT_DIR
    if data_root is not None:
        env["REF_GT_LINEMOD_ROOT"] = data_root
    if out_root is not None:
        env["REF_GT_OUTPUT_ROOT"] = out_root
        out_dir = osp.join(out_root, osp.basename(EXP_DIR))
        # keep the persistent XLA cache shared across throwaway roots
        env.setdefault("REF_GT_COMPILE_CACHE", osp.expanduser("~/.cache/ref_gt_xla"))
    if ddpm_steps is not None:
        env["REF_GT_DDPM_STEPS"] = str(ddpm_steps)

    if not keep_output and osp.exists(out_dir):
        shutil.rmtree(out_dir)
    make_synthetic_linemod_tree(base)

    enc_log = run_phase(
        "trainval_encoder.py",
        ["--max_iteration", str(encoder_iters),
         "--snapshot_steps", str(snapshot_every or max(encoder_iters // 2, 1)),
         "--log_steps", "1"],
        "train_encoder.log", out_dir, env,
    )
    enc_traj = parse_loss_trajectory(enc_log)
    assert enc_traj, f"no training losses parsed from {enc_log}"

    cordi_log = run_phase(
        "train_cordi.py",
        # the DDPM val (100-step reverse sampler) is the expensive part on
        # CPU — snapshot_every lets tests run it exactly once, at the end
        ["--max_iteration", str(cordi_iters),
         "--snapshot_steps", str(snapshot_every or max(cordi_iters // 2, 1)),
         "--encoder_snapshot", f"iter-{encoder_iters}", "--log_steps", "1"],
        "train_cordi.log", out_dir, env,
    )
    cordi_traj = parse_loss_trajectory(cordi_log)
    assert cordi_traj, f"no training losses parsed from {cordi_log}"
    ddpm_val = parse_val_metrics(cordi_log, ["PIR", "PIR_0.5", "PIR_0.25", "IIR"])
    enc_val = parse_val_metrics(enc_log, ["PIR", "IR", "RRE", "RTE"])

    def head_tail(traj, k=3):
        vals = [v for _, v in traj]
        k = min(k, max(1, len(vals) // 2))
        return float(np.mean(vals[:k])), float(np.mean(vals[-k:]))

    enc_first, enc_last = head_tail(enc_traj)
    cordi_first, cordi_last = head_tail(cordi_traj)

    return {
        "encoder_iters": encoder_iters,
        "cordi_iters": cordi_iters,
        "encoder_loss_first": round(enc_first, 4),
        "encoder_loss_last": round(enc_last, 4),
        "cordi_loss_first": round(cordi_first, 4),
        "cordi_loss_last": round(cordi_last, 4),
        "encoder_val": enc_val,
        "ddpm_val": ddpm_val,
        "encoder_descended": enc_last < enc_first,
        "cordi_descended": cordi_last < cordi_first,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_iters", type=int, default=200)
    parser.add_argument("--cordi_iters", type=int, default=100)
    parser.add_argument("--keep_output", action="store_true")
    args = parser.parse_args()

    summary = drive(args.encoder_iters, args.cordi_iters, keep_output=args.keep_output)
    print(json.dumps(summary))
    if not summary["encoder_descended"]:
        raise SystemExit("encoder loss did not descend")
    if not summary["cordi_descended"]:
        raise SystemExit("cordi loss did not descend")
    if not all(k in summary["ddpm_val"] for k in ("PIR", "PIR_0.5", "PIR_0.25", "IIR")):
        raise SystemExit(f"DDPM val metrics missing: {summary['ddpm_val']}")


if __name__ == "__main__":
    main()
