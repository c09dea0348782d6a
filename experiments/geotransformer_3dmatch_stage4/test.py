"""3DMatch/3DLoMatch test: run the model over the benchmark split and dump
per-pair .npz feature/correspondence files for offline eval.

Ref parity: experiments/geotransformer.3dmatch.../test.py:65-102 (two-phase
test/eval protocol; eval.py consumes the dumps). Padded slots are stripped
before dumping so the .npz contents look exactly like the reference's.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", choices=["3DMatch", "3DLoMatch", "val"], default="3DMatch")
    parser.add_argument("--snapshot", required=True, help="epoch snapshot name (e.g. epoch-40)")
    parser.add_argument("--rotated", action="store_true", help="rotated benchmark variant (dataset.py:114-122)")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from config import FEATURE_DIR, LOG_DIR, SNAPSHOT_DIR, make_cfg
    from dataset import test_data_loader
    from ref_geotransformer_tpu.engine import SingleTester, create_train_state
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer
    from ref_geotransformer_tpu.utils.common import ensure_dir

    cfg = make_cfg()
    feature_dir = osp.join(FEATURE_DIR, args.benchmark)
    ensure_dir(feature_dir)
    ensure_dir(LOG_DIR)

    loader = test_data_loader(cfg, args.benchmark, rotated=args.rotated)
    model = GeoTransformer(cfg)

    pair0, _ = next(iter(loader.iter_single()))
    state, _ = create_train_state(model, ensure_pyramids(cfg, pair0), cfg.optim, steps_per_epoch=1)

    def after_test_step(i, data, meta, output):
        scene_name = meta["scene_name"]
        ref_frame, src_frame = meta["ref_frame"], meta["src_frame"]
        ref_mask_c = np.asarray(output["ref_node_masks"])
        src_mask_c = np.asarray(output["src_node_masks"])
        ref_mask_f = np.asarray(output["ref_masks_f"])
        src_mask_f = np.asarray(output["src_masks_f"])
        corr_masks = np.asarray(output["corr_masks"])
        # everything coarse is dumped in COMPACTED (valid-nodes-only) space so
        # the offline eval sees self-consistent shapes: compact the GT map and
        # remap the proposal indices from padded to compact positions
        ref_remap = np.cumsum(ref_mask_c) - 1
        src_remap = np.cumsum(src_mask_c) - 1
        ref_node_corr = ref_remap[np.asarray(output["ref_node_corr_indices"])]
        src_node_corr = src_remap[np.asarray(output["src_node_corr_indices"])]
        gt_map = np.asarray(output["gt_node_overlap_map"])[np.ix_(ref_mask_c, src_mask_c)]
        file_name = osp.join(feature_dir, f"{scene_name}_{ref_frame}_{src_frame}.npz")
        np.savez_compressed(
            file_name,
            ref_points=np.asarray(data["ref_points"])[np.asarray(data["ref_masks"])],
            src_points=np.asarray(data["src_points"])[np.asarray(data["src_masks"])],
            ref_points_f=np.asarray(output["ref_points_f"])[ref_mask_f],
            src_points_f=np.asarray(output["src_points_f"])[src_mask_f],
            ref_points_c=np.asarray(output["ref_points_c"])[ref_mask_c],
            src_points_c=np.asarray(output["src_points_c"])[src_mask_c],
            ref_feats_c=np.asarray(output["ref_feats_c"])[ref_mask_c],
            src_feats_c=np.asarray(output["src_feats_c"])[src_mask_c],
            ref_node_corr_indices=ref_node_corr,
            src_node_corr_indices=src_node_corr,
            ref_corr_points=np.asarray(output["ref_corr_points"])[corr_masks],
            src_corr_points=np.asarray(output["src_corr_points"])[corr_masks],
            corr_scores=np.asarray(output["corr_scores"])[corr_masks],
            gt_node_corr_overlaps=gt_map,
            estimated_transform=np.asarray(output["estimated_transform"]),
            transform=np.asarray(data["transform"]),
            overlap=meta.get("overlap", 1.0),
        )

    tester = SingleTester.from_snapshot(
        cfg,
        model,
        state,
        SNAPSHOT_DIR,
        args.snapshot,
        loader.iter_single(),
        after_test_step=after_test_step,
        log_file=osp.join(LOG_DIR, f"test-{args.benchmark}.log"),
    )
    summary = tester.run()
    print({k: round(v, 4) for k, v in summary.items()})


if __name__ == "__main__":
    main()
