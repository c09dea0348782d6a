"""Measure the reference PyTorch pipeline on CPU — the baseline denominator.

VERDICT r03 #3: bench.py's `vs_baseline` divides by an *assumed* 5 pairs/s
for the reference's full single-GPU pipeline. Nobody measured that number.
This tool measures what CAN be measured in this sandbox: the genuine
reference implementation (mounted read-only at /root/reference) running its
real collate (the C++ voxel-grid + nanoflann KD-tree cores, compiled
verbatim via tools/ref_baseline_ext.cpp) and its real full-size 3DMatch
model forward, on torch-CPU, on the repo's demo pair.

What this gives us:
  * torch_cpu_forward_s / torch_cpu_collate_s — measured, this machine.
  * a documented CPU->GPU bracket: the paper reports 0.296 s/pair model
    time on a GPU (README.md:11 context / GeoTransformer paper Table 7),
    i.e. 3.38 pairs/s forward-only; the collate stays on CPU in the
    reference design (DataLoader workers, num_workers=8, config.py:40),
    so the full-pipeline steady-state is bounded by
    max(forward_gpu, collate_cpu / num_workers).

Usage:
    python tools/bench_torch_baseline.py [--iters 5] [--threads N]

Prints one JSON line and writes BASELINE_TORCH_CPU.json at the repo root.
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import os.path as osp
import subprocess
import sys
import time
import types

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF_EXT_DIR = "/root/reference/geotransformer/extensions"
LIB_PATH = "/tmp/refext/libref_baseline.so"


def build_lib() -> str:
    if osp.isfile(LIB_PATH):
        return LIB_PATH
    os.makedirs(osp.dirname(LIB_PATH), exist_ok=True)
    srcs = [
        osp.join(REPO, "tools", "ref_baseline_ext.cpp"),
        f"{REF_EXT_DIR}/extra/cloud/cloud.cpp",
        f"{REF_EXT_DIR}/cpu/grid_subsampling/grid_subsampling_cpu.cpp",
        f"{REF_EXT_DIR}/cpu/radius_neighbors/radius_neighbors_cpu.cpp",
    ]
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", f"-I{REF_EXT_DIR}", *srcs, "-o", LIB_PATH],
        check=True,
    )
    return LIB_PATH


def install_ref_ext() -> None:
    """Install a `geotransformer.ext`-compatible module backed by the
    compiled reference cores (same tensor API as the original torch glue,
    extensions/cpu/*/{grid_subsampling,radius_neighbors}.cpp)."""
    import torch

    lib = ctypes.CDLL(build_lib())
    lib.ref_grid_subsample.restype = ctypes.c_long
    lib.ref_radius_neighbors.restype = ctypes.c_long

    f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))

    def grid_subsampling(points, lengths, voxel_size):
        pts = np.ascontiguousarray(points.numpy(), np.float32)
        lens = np.ascontiguousarray(lengths.numpy(), np.int64)
        total = lib.ref_grid_subsample(
            f32p(pts), i64p(lens), len(lens), len(pts), ctypes.c_float(voxel_size)
        )
        out_pts = np.empty((total, 3), np.float32)
        out_lens = np.empty((len(lens),), np.int64)
        lib.ref_grid_subsample_fetch(f32p(out_pts), i64p(out_lens), len(lens))
        return torch.from_numpy(out_pts), torch.from_numpy(out_lens)

    def radius_neighbors(q_points, s_points, q_lengths, s_lengths, radius):
        q = np.ascontiguousarray(q_points.numpy(), np.float32)
        s = np.ascontiguousarray(s_points.numpy(), np.float32)
        ql = np.ascontiguousarray(q_lengths.numpy(), np.int64)
        sl = np.ascontiguousarray(s_lengths.numpy(), np.int64)
        width = lib.ref_radius_neighbors(
            f32p(q), f32p(s), i64p(ql), i64p(sl), len(ql), len(q), len(s), ctypes.c_float(radius)
        )
        out = np.empty((len(q), width), np.int64)
        lib.ref_radius_neighbors_fetch(i64p(out))
        return torch.from_numpy(out)

    ext = types.ModuleType("geotransformer.ext")
    ext.grid_subsampling = grid_subsampling
    ext.radius_neighbors = radius_neighbors
    sys.modules["geotransformer.ext"] = ext


def make_full_cfg():
    """Full-size 3DMatch stage-4 config (reference experiments/
    geotransformer.3dmatch.../config.py:75-145 — the published-numbers
    model, NOT the shrunk parity dims)."""
    sys.path.insert(0, osp.join(REPO, "tests"))
    from torch_ref import NS  # noqa: PLC0415

    cfg = NS()
    cfg.model = NS(
        ground_truth_matching_radius=0.05, num_points_in_patch=64, num_sinkhorn_iterations=100
    )
    cfg.backbone = NS(
        num_stages=4, init_voxel_size=0.025, kernel_size=15, base_radius=2.5, base_sigma=2.0,
        init_radius=2.5 * 0.025, init_sigma=2.0 * 0.025, group_norm=32,
        input_dim=1, init_dim=64, output_dim=256,
    )
    cfg.geotransformer = NS(
        input_dim=1024, hidden_dim=256, output_dim=256, num_heads=4,
        blocks=["self", "cross", "self", "cross", "self", "cross"],
        sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max",
    )
    cfg.coarse_matching = NS(
        num_targets=128, overlap_threshold=0.1, num_correspondences=256, dual_normalization=True
    )
    cfg.fine_matching = NS(
        topk=3, acceptance_radius=0.1, mutual=True, confidence_threshold=0.05,
        use_dustbin=False, use_global_score=False, correspondence_threshold=3,
        correspondence_limit=None, num_refinement_steps=5,
    )
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--threads", type=int, default=0, help="torch CPU threads (0 = all)")
    args = parser.parse_args()

    install_ref_ext()  # must precede torch_ref's stub installation
    sys.path.insert(0, osp.join(REPO, "tests"))
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    import torch_ref

    model_mod = torch_ref.ref_experiment()
    from geotransformer.utils.data import registration_collate_fn_stack_mode

    cfg = make_full_cfg()
    model = model_mod.GeoTransformer(cfg)
    model.eval()

    ref_points = np.load(osp.join(REPO, "data", "demo", "ref.npy")).astype(np.float32)
    src_points = np.load(osp.join(REPO, "data", "demo", "src.npy")).astype(np.float32)
    gt = np.load(osp.join(REPO, "data", "demo", "gt.npy")).astype(np.float32)
    raw = {
        "ref_points": ref_points,
        "src_points": src_points,
        "ref_feats": np.ones((ref_points.shape[0], 1), np.float32),
        "src_feats": np.ones((src_points.shape[0], 1), np.float32),
        "transform": gt,
    }
    neighbor_limits = [38, 36, 36, 38]  # reference demo.py:52

    def _contig(x):
        # the reference's DataLoader workers serialize collate outputs
        # through shared memory, which contiguity-normalizes the
        # neighbor_limit column slices (radius_search.py:25-27); without a
        # DataLoader the sliced views reach index_select's .view(-1) and
        # crash — replicate the worker behavior here (and pay its cost
        # inside the timed section, as the real pipeline does)
        return x.contiguous() if isinstance(x, torch.Tensor) else x

    def collate():
        out = registration_collate_fn_stack_mode(
            [dict(raw)], cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius, neighbor_limits,
        )
        return {
            k: [_contig(x) for x in v] if isinstance(v, list) else _contig(v)
            for k, v in out.items()
        }

    # warmup + timed collate (the reference's per-pair CPU precompute:
    # C++ voxel grid + nanoflann KD-tree searches, utils/data.py:13-81)
    data_dict = collate()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        data_dict = collate()
    collate_s = (time.perf_counter() - t0) / args.iters

    with torch.no_grad():
        model(data_dict)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = model(data_dict)
        forward_s = (time.perf_counter() - t0) / args.iters

    rre = float(out["estimated_transform"][0, 0])  # touch output
    assert np.isfinite(rre)

    num_workers = 8  # reference config.py:40 — collate runs in 8 workers
    paper_forward_gpu_s = 0.296  # GeoTransformer paper: model+pose time per pair
    pipeline_cpu = 1.0 / (collate_s + forward_s)
    # steady-state single-GPU estimate: workers pipeline the collate
    pipeline_gpu_est = 1.0 / max(paper_forward_gpu_s, collate_s / num_workers)

    payload = {
        "metric": "torch_cpu_full_pipeline_pairs_per_sec",
        "value": round(pipeline_cpu, 4),
        "unit": "pairs/sec",
        "torch_cpu_collate_s": round(collate_s, 4),
        "torch_cpu_forward_s": round(forward_s, 4),
        "torch_threads": torch.get_num_threads(),
        "iters": args.iters,
        "paper_forward_gpu_s": paper_forward_gpu_s,
        "single_gpu_pipeline_est_pairs_per_sec": round(pipeline_gpu_est, 3),
        "cpu_cores": os.cpu_count(),
        "notes": "collate = genuine reference C++ cores (compiled verbatim); "
                 "forward = genuine reference model, full 3DMatch dims, torch-CPU "
                 f"({os.cpu_count()}-core sandbox); "
                 "GPU estimate = paper 0.296 s/pair forward overlapped with "
                 "measured collate across 8 workers (collate is NOT the "
                 f"bottleneck: {collate_s:.2f} s / 8 workers "
                 f"{'<' if collate_s / num_workers < paper_forward_gpu_s else '>'} "
                 "0.296 s forward); single-core box — treat timings as upper "
                 "bounds and run when idle",
    }
    print(json.dumps(payload))
    with open(osp.join(REPO, "BASELINE_TORCH_CPU.json"), "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
