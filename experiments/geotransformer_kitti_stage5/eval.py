"""Offline KITTI evaluation over test.py's .npz dumps.

Ref parity: kitti experiment eval.py — per-pair RRE/RTE (+ recall at
RRE < 5 deg AND RTE < 2 m) by method (lgr stored transform | svd | ransac).
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

from config import FEATURE_DIR, make_cfg
from ref_geotransformer_tpu.utils.registration import (
    compute_inlier_ratio,
    compute_registration_error,
    ransac_registration_np,
    weighted_procrustes_np,
)
from ref_geotransformer_tpu.utils.summary_board import SummaryBoard


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", choices=["lgr", "svd", "ransac"], default="lgr")
    parser.add_argument("--num_corr", type=int, default=None)
    args = parser.parse_args()
    cfg = make_cfg()

    board = SummaryBoard(adaptive=True)
    for file_name in sorted(glob.glob(osp.join(FEATURE_DIR, "*.npz"))):
        data = np.load(file_name)
        ref_corr, src_corr, scores = data["ref_corr_points"], data["src_corr_points"], data["corr_scores"]
        if args.num_corr is not None and ref_corr.shape[0] > args.num_corr:
            sel = np.argsort(-scores)[: args.num_corr]
            ref_corr, src_corr, scores = ref_corr[sel], src_corr[sel], scores[sel]
        transform = data["transform"]

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
        rre, rte = compute_registration_error(transform, est)
        ir = compute_inlier_ratio(ref_corr, src_corr, transform, cfg.eval.acceptance_radius)
        accepted = rre < cfg.eval.rre_threshold and rte < cfg.eval.rte_threshold
        board.update_from_result_dict({"RR": float(accepted), "IR": ir})
        if accepted:
            board.update_from_result_dict({"RRE": rre, "RTE": rte})
    print({k: round(v, 4) for k, v in board.summary().items()})


if __name__ == "__main__":
    main()
