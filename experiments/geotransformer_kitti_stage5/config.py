"""KITTI odometry stage5 experiment config.

Value parity: experiments/geotransformer.kitti.stage5.gse.k3.max.oacl.
stage2.sinkhorn/config.py:33-141 (5-stage backbone, voxel 0.3 m, radius
4.25x, patch K=128, geo input_dim 2048, sigma_d 4.8, fine topk 2, acceptance
0.6/1.0 m, RR criterion RRE<5 deg & RTE<2 m, 160 epochs, log_scale 40).
Capacities are sized for the 0.3 m-downsampled odometry scans; neighbor
limits default to generous values — recalibrate with
ref_geotransformer_tpu.data.calibration against the real dataset.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from ref_geotransformer_tpu.config import (
    BackboneConfig,
    CapacityConfig,
    CoarseLossConfig,
    CoarseMatchingConfig,
    EvalConfig,
    FineLossConfig,
    FineMatchingConfig,
    GeoTransformerConfig,
    GeoTransformerModuleConfig,
    LossWeights,
    ModelConfig,
    OptimConfig,
    RansacConfig,
    TestDataConfig,
    TrainDataConfig,
)

_WORKING_DIR = osp.dirname(osp.realpath(__file__))
_ROOT_DIR = osp.dirname(osp.dirname(_WORKING_DIR))
EXP_NAME = osp.basename(_WORKING_DIR)
OUTPUT_DIR = osp.join(os.environ.get("REF_GT_OUTPUT_ROOT", osp.join(_ROOT_DIR, "output")), EXP_NAME)
SNAPSHOT_DIR = osp.join(OUTPUT_DIR, "snapshots")
LOG_DIR = osp.join(OUTPUT_DIR, "logs")
FEATURE_DIR = osp.join(OUTPUT_DIR, "features")
REGISTRATION_DIR = osp.join(OUTPUT_DIR, "registration")
DATASET_ROOT = os.environ.get("REF_GT_KITTI_ROOT", osp.join(_ROOT_DIR, "data", "Kitti"))


def make_cfg() -> GeoTransformerConfig:
    capacities = CapacityConfig(
        points=(30720, 10240, 3072, 1024, 384),
        neighbor_limits=(40, 38, 36, 36, 34),
        gt_candidates=2048,
        correspondence_limit=8192,
        search_chunk=2048,
    )
    # REF_GT_CAPS_SCALE shrinks the static point capacities (fixture-size
    # scans / fast CI); channel dims are untouched (same knob as 3dmatch)
    scale = float(os.environ.get("REF_GT_CAPS_SCALE", "1.0"))
    if scale != 1.0:
        pts = tuple(max(128, int(p * scale)) for p in capacities.points)
        capacities = CapacityConfig(
            points=pts,
            neighbor_limits=capacities.neighbor_limits,
            gt_candidates=min(capacities.gt_candidates, pts[-1] * 4),
            correspondence_limit=min(capacities.correspondence_limit, 2048),
            search_chunk=min(capacities.search_chunk, 512),
        )
    return GeoTransformerConfig(
        seed=7351,
        capacities=capacities,
        backbone=BackboneConfig(
            num_stages=5,
            init_voxel_size=0.3,
            kernel_size=15,
            base_radius=4.25,
            base_sigma=2.0,
            group_norm=32,
            input_dim=1,
            init_dim=64,
            output_dim=256,
            fine_level=1,
        ),
        model=ModelConfig(
            ground_truth_matching_radius=0.6,
            num_points_in_patch=128,
            num_sinkhorn_iterations=100,
        ),
        coarse_matching=CoarseMatchingConfig(
            num_targets=128, overlap_threshold=0.1, num_correspondences=256, dual_normalization=True
        ),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=2048,
            hidden_dim=128,
            output_dim=256,
            num_heads=4,
            blocks=("self", "cross", "self", "cross", "self", "cross"),
            sigma_d=4.8,
            sigma_a=15.0,
            angle_k=3,
            reduction_a="max",
        ),
        fine_matching=FineMatchingConfig(
            topk=2,
            acceptance_radius=0.6,
            mutual=True,
            confidence_threshold=0.05,
            use_dustbin=False,
            use_global_score=False,
            correspondence_threshold=3,
            correspondence_limit=None,
            num_refinement_steps=5,
        ),
        coarse_loss=CoarseLossConfig(
            positive_margin=0.1,
            negative_margin=1.4,
            positive_optimal=0.1,
            negative_optimal=1.4,
            log_scale=40.0,
            positive_overlap=0.1,
        ),
        fine_loss=FineLossConfig(positive_radius=0.6),
        loss=LossWeights(),
        eval=EvalConfig(
            acceptance_overlap=0.0,
            acceptance_radius=1.0,
            inlier_ratio_threshold=0.05,
            rre_threshold=5.0,
            rte_threshold=2.0,
            recall_criterion="rre_rte",
        ),
        ransac=RansacConfig(distance_threshold=0.3, num_points=4, num_iterations=50000),
        optim=OptimConfig(
            lr=1e-4, lr_decay=0.95, lr_decay_steps=4, weight_decay=1e-6, max_epoch=160, grad_acc_steps=1
        ),
        train=TrainDataConfig(
            batch_size=1,
            num_workers=8,
            point_limit=30000,
            use_augmentation=True,
            augmentation_noise=0.01,
            augmentation_rotation=1.0,
        ),
        test=TestDataConfig(batch_size=1, num_workers=8, point_limit=None),
    )
