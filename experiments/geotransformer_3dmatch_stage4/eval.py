"""Offline 3DMatch/3DLoMatch evaluation over test.py's .npz dumps.

Ref parity: experiments/geotransformer.3dmatch.../eval.py:41-365 — per-pair
coarse (PIR) and fine (IR/FMR) metrics, transform estimation by method
(lgr = stored transform | svd = numpy weighted Procrustes | ransac = numpy
correspondence RANSAC), scene-level registration recall via the redwood
gt.log/gt.info covariance error.

Usage: python eval.py --benchmark 3DMatch --method lgr
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

from config import DATASET_ROOT, FEATURE_DIR, REGISTRATION_DIR, make_cfg
from ref_geotransformer_tpu.data.benchmark_3dmatch import (
    evaluate_registration_one_scene,
    get_num_fragments,
    get_scene_abbr,
    write_log_file,
)
from ref_geotransformer_tpu.utils.registration import (
    compute_inlier_ratio,
    evaluate_sparse_correspondences,
    ransac_registration_np,
    weighted_procrustes_np,
)
from ref_geotransformer_tpu.utils.common import ensure_dir
from ref_geotransformer_tpu.utils.summary_board import SummaryBoard


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", choices=["3DMatch", "3DLoMatch", "val"], default="3DMatch")
    parser.add_argument("--method", choices=["lgr", "svd", "ransac"], default="lgr")
    parser.add_argument("--num_corr", type=int, default=None, help="top-k correspondences to keep")
    parser.add_argument("--feature_dir", default=None, help="override feature dir (default FEATURE_DIR/<benchmark>)")
    parser.add_argument("--verbose", action="store_true")
    return parser.parse_args()


def eval_one_epoch(args, cfg):
    feature_dir = getattr(args, "feature_dir", None) or osp.join(FEATURE_DIR, args.benchmark)
    benchmark_dir = osp.join(DATASET_ROOT, "metadata", "benchmarks", args.benchmark)

    coarse_board = SummaryBoard(adaptive=True)
    fine_board = SummaryBoard(adaptive=True)

    scene_results = {}
    file_names = sorted(glob.glob(osp.join(feature_dir, "*.npz")))
    for file_name in file_names:
        base = osp.basename(file_name)[: -len(".npz")]
        scene_name, ref_id, src_id = base.rsplit("_", 2)
        data = np.load(file_name)

        # coarse metrics
        coarse = evaluate_sparse_correspondences(
            data["ref_points_c"],
            data["src_points_c"],
            data["ref_node_corr_indices"],
            data["src_node_corr_indices"],
            data["gt_node_corr_overlaps"],
        )
        coarse_board.update_from_result_dict(coarse)

        # fine metrics
        ref_corr = data["ref_corr_points"]
        src_corr = data["src_corr_points"]
        scores = data["corr_scores"]
        if args.num_corr is not None and ref_corr.shape[0] > args.num_corr:
            sel = np.argsort(-scores)[: args.num_corr]
            ref_corr, src_corr, scores = ref_corr[sel], src_corr[sel], scores[sel]
        transform = data["transform"]
        ir = compute_inlier_ratio(ref_corr, src_corr, transform, cfg.eval.acceptance_radius)
        fine_board.update_from_result_dict(
            {"IR": ir, "FMR": float(ir >= cfg.eval.inlier_ratio_threshold), "num_corr": ref_corr.shape[0]}
        )

        # estimated transform by method
        if args.method == "lgr":
            est = data["estimated_transform"]
        elif args.method == "svd":
            est = weighted_procrustes_np(src_corr, ref_corr, scores)
        else:
            est = ransac_registration_np(
                ref_corr,
                src_corr,
                distance_threshold=cfg.ransac.distance_threshold,
                num_points=cfg.ransac.num_points,
                num_iterations=cfg.ransac.num_iterations,
            )
        scene_results.setdefault(scene_name, []).append(
            {
                "test_pair": [int(ref_id), int(src_id)],
                "num_fragments": get_num_fragments(scene_name),
                "transform": est,
            }
        )

    # scene-level registration recall
    registration_board = SummaryBoard(adaptive=True)
    for scene_name, pairs in sorted(scene_results.items()):
        est_log_dir = osp.join(REGISTRATION_DIR, args.benchmark, args.method, scene_name)
        ensure_dir(est_log_dir)
        result_file = osp.join(est_log_dir, "est.log")
        write_log_file(result_file, pairs)
        result = evaluate_registration_one_scene(
            osp.join(benchmark_dir, scene_name, "gt.log"),
            osp.join(benchmark_dir, scene_name, "gt.info"),
            result_file,
            positive_threshold=cfg.eval.rmse_threshold,
        )
        registration_board.update("RR", result["recall"])
        registration_board.update("mean_rre", result["mean_rre"])
        registration_board.update("mean_rte", result["mean_rte"])
        if args.verbose:
            print(
                f"{get_scene_abbr(scene_name)}: RR {result['recall']:.4f} "
                f"RRE {result['mean_rre']:.3f} RTE {result['mean_rte']:.3f}"
            )

    summary = {
        "PIR": coarse_board.mean("PIR"),
        "IR": fine_board.mean("IR"),
        "FMR": fine_board.mean("FMR"),
        "RR": registration_board.mean("RR"),
        "mean_rre": registration_board.mean("mean_rre"),
        "mean_rte": registration_board.mean("mean_rte"),
    }
    return summary


def main():
    args = parse_args()
    cfg = make_cfg()
    summary = eval_one_epoch(args, cfg)
    print({k: round(v, 4) for k, v in summary.items()})


if __name__ == "__main__":
    main()
