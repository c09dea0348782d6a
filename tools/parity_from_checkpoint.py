"""Pretrained-parity runbook: published reference weights -> BASELINE.md rows
in ONE command (VERDICT r03 #10).

The de-facto acceptance test for this rebuild is reproducing the reference's
published 3DMatch/3DLoMatch numbers (FMR 98.2/IR 70.9/RR 92.5 and
87.1/43.5/74.2, /root/reference/README.md:184-215) from its released
`geotransformer-3dmatch.pth.tar`. Weights and datasets cannot be downloaded
in this sandbox, so this script pre-stages the whole chain; the moment both
are available it is:

    python tools/parity_from_checkpoint.py \
        --checkpoint geotransformer-3dmatch.pth.tar \
        --data_root /path/to/data/3DMatch \
        --benchmarks 3DMatch 3DLoMatch

Chain: convert .pth.tar -> orbax snapshot (utils/convert_checkpoint.py, the
converter is parity-proven against live reference modules in
tests/test_torch_parity.py) -> test.py per benchmark (feature/corr dumps)
-> eval.py --method lgr (scene-level RR protocol) -> table vs published.

The chain runs TWICE per benchmark: once with reference-exact selection
(REF_GT_EXACT_SELECT=1, the parity setting) and once with the shipped TPU
approx_min_k defaults (REF_GT_EXACT_SELECT=0) — the exact-vs-approx quality
A/B that closes DESIGN.md §6.2's open end the day real weights appear.
Disable the second leg with --no_selection_ab.

`--dry_run` proves the plumbing in-sandbox: builds a random-init checkpoint
in the reference's own .pth.tar format (from the live reference torch model),
a synthetic 3DMatch fixture tree, and drives the same chain at tiny caps.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
EXP_DIR = osp.join(ROOT, "experiments", "geotransformer_3dmatch_stage4")

PUBLISHED = {
    "3DMatch": {"FMR": 98.2, "IR": 70.9, "RR": 92.5},
    "3DLoMatch": {"FMR": 87.1, "IR": 43.5, "RR": 74.2},
}


def run(cmd, env, tag):
    print(f"[parity] {tag}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:] + "\n")
        raise RuntimeError(f"{tag} failed (rc={proc.returncode})")
    return proc.stdout


def parse_eval_summary(stdout: str) -> dict:
    """Pull the final metric summary out of eval.py's output."""
    metrics = {}
    for key in ("PIR", "FMR", "IR", "RR", "RRE", "RTE", "RMSE"):
        hits = re.findall(rf"\b{key}[:=]\s*([0-9.]+)", stdout)
        if hits:
            metrics[key] = float(hits[-1])
    return metrics


def make_dry_run_checkpoint(path: str) -> None:
    """Random-init checkpoint in the reference's own format: instantiate the
    live reference torch model (full 3DMatch dims) and save its state_dict
    as {'model': ...} — byte-compatible with the released .pth.tar."""
    sys.path.insert(0, osp.join(ROOT, "tests"))
    import torch

    import torch_ref
    from bench_torch_baseline import make_full_cfg  # tools/ sibling

    model_mod = torch_ref.ref_experiment()
    model = model_mod.GeoTransformer(make_full_cfg())
    torch.save({"model": model.state_dict()}, path)
    print(f"[parity] wrote random-init reference-format checkpoint: {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None, help="reference .pth.tar")
    parser.add_argument("--data_root", default=None, help="3DMatch dataset root (metadata/ + data/)")
    parser.add_argument("--benchmarks", nargs="+", default=["3DMatch", "3DLoMatch"])
    parser.add_argument("--output_root", default="/tmp/parity_run")
    parser.add_argument("--snapshot_name", default="epoch-published")
    parser.add_argument("--caps_scale", default=None, help="REF_GT_CAPS_SCALE override (dry runs)")
    parser.add_argument("--dry_run", action="store_true",
                        help="random-init checkpoint + synthetic fixture tree at tiny caps")
    parser.add_argument("--no_selection_ab", action="store_true",
                        help="skip the approx-selection leg (exact-only parity run)")
    parser.add_argument("--out", default=None, help="write the result JSON here")
    args = parser.parse_args()

    os.makedirs(args.output_root, exist_ok=True)
    checkpoint = args.checkpoint
    data_root = args.data_root

    if args.dry_run:
        checkpoint = checkpoint or osp.join(args.output_root, "random_init.pth.tar")
        if not osp.isfile(checkpoint):
            make_dry_run_checkpoint(checkpoint)
        if data_root is None:
            data_root = osp.join(args.output_root, "fixture_tree")
            if not osp.isdir(osp.join(data_root, "metadata")):
                sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
                from train_3dmatch_fixture import make_fixture_tree

                make_fixture_tree(data_root, n_train=2, n_val=2, points=1800)
        args.benchmarks = ["val"]
        args.caps_scale = args.caps_scale or "0.08"

    if not checkpoint or not data_root:
        parser.error("--checkpoint and --data_root are required (or use --dry_run)")

    env = dict(
        os.environ,
        REF_GT_3DMATCH_ROOT=data_root,
        REF_GT_OUTPUT_ROOT=args.output_root,
    )
    if args.caps_scale:
        env["REF_GT_CAPS_SCALE"] = args.caps_scale
    env.setdefault("REF_GT_COMPILE_CACHE", osp.expanduser("~/.cache/ref_gt_xla"))
    # parity runs want reference-exact selection semantics unless told not to
    env.setdefault("REF_GT_EXACT_SELECT", "1")

    # 1) convert the checkpoint into the experiment's snapshot dir
    snapshot_dir = osp.join(args.output_root, "geotransformer_3dmatch_stage4", "snapshots")
    run(
        [sys.executable, "-m", "ref_geotransformer_tpu.utils.convert_checkpoint",
         checkpoint, snapshot_dir, "--name", args.snapshot_name, "--experiment", "3dmatch"],
        env, "convert",
    )

    # 2+3) test.py then eval.py per benchmark, per selection mode: 'exact'
    # is the parity leg; 'approx' re-runs the same weights under the shipped
    # TPU approx_min_k defaults (the §6.2 exact-vs-approx quality A/B)
    selection_modes = ["exact"] if args.no_selection_ab else ["exact", "approx"]
    results = {mode: {} for mode in selection_modes}
    for mode in selection_modes:
        mode_env = dict(env, REF_GT_EXACT_SELECT="1" if mode == "exact" else "0")
        # separate feature-dump roots so the legs never overwrite each other
        mode_env["REF_GT_OUTPUT_ROOT"] = osp.join(args.output_root, mode)
        # reuse the converted snapshot from step 1 (shared across modes)
        os.makedirs(osp.join(mode_env["REF_GT_OUTPUT_ROOT"],
                             "geotransformer_3dmatch_stage4"), exist_ok=True)
        link = osp.join(mode_env["REF_GT_OUTPUT_ROOT"],
                        "geotransformer_3dmatch_stage4", "snapshots")
        if not osp.exists(link):
            os.symlink(snapshot_dir, link)
        for benchmark in args.benchmarks:
            run([sys.executable, osp.join(EXP_DIR, "test.py"),
                 "--snapshot", args.snapshot_name, "--benchmark", benchmark],
                mode_env, f"test:{benchmark}:{mode}")
            out = run([sys.executable, osp.join(EXP_DIR, "eval.py"),
                       "--benchmark", benchmark, "--method", "lgr"],
                      mode_env, f"eval:{benchmark}:{mode}")
            results[mode][benchmark] = parse_eval_summary(out)

    # 4) table vs published (exact = the parity leg), then exact-vs-approx
    print("\n| Benchmark | Metric | Published | This repo (exact) | d |")
    print("|---|---|---|---|---|")
    for benchmark, metrics in results["exact"].items():
        pub = PUBLISHED.get(benchmark, {})
        for key, value in metrics.items():
            p = pub.get(key)
            delta = f"{value - p:+.2f}" if p is not None else "-"
            print(f"| {benchmark} | {key} | {p if p is not None else '-'} | {value} | {delta} |")
    if "approx" in results:
        print("\n| Benchmark | Metric | exact | approx (TPU default) | d |")
        print("|---|---|---|---|---|")
        for benchmark, metrics in results["approx"].items():
            for key, value in metrics.items():
                e = results["exact"].get(benchmark, {}).get(key)
                delta = f"{value - e:+.2f}" if e is not None else "-"
                print(f"| {benchmark} | {key} | {e if e is not None else '-'} | {value} | {delta} |")

    payload = {"checkpoint": checkpoint, "data_root": data_root,
               "benchmarks": results["exact"], "selection_ab": results,
               "published": PUBLISHED, "dry_run": args.dry_run}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
