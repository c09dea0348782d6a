"""ModelNet rpmnet.stage4 experiment config (fork-modified: trains on
LineMod by default, two-phase encoder + Cordi DDPM).

Value parity: experiments/geotransformer.modelnet.rpmnet.stage4.gse.k3.max.
oacl.stage2.sinkhorn/config.py:33-173 — 3-stage backbone (the dir name says
stage4 like the reference's, but decoders stop at level 0), voxel 0.003 m
(LineMod meters), geo input_dim 512, coarse num_targets/correspondences 64,
patch K=128, iteration-based warmup-cosine training (100k iters), plus the
Cordi DDPM block. ModelNet acceptance: RRE < 1 deg, RTE < 0.1.
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
    DDPMConfig,
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
SNAPSHOT_ENCODER_DIR = osp.join(SNAPSHOT_DIR, "encoder")
SNAPSHOT_DDPM_DIR = osp.join(SNAPSHOT_DIR, "ddpm")
LOG_DIR = osp.join(OUTPUT_DIR, "logs")
FEATURE_DIR = osp.join(OUTPUT_DIR, "features")
MODELNET_ROOT = os.environ.get("REF_GT_MODELNET_ROOT", osp.join(_ROOT_DIR, "data", "ModelNet"))
LINEMOD_ROOT = os.environ.get("REF_GT_LINEMOD_ROOT", osp.join(_ROOT_DIR, "data"))

# REF_GT_DDPM_STEPS shrinks the diffusion chain for smoke/CI runs (the
# 100-step reverse sampler dominates DDPM val time on slow backends)
DDPM = DDPMConfig(num_steps=int(os.environ.get("REF_GT_DDPM_STEPS", "100")))

# LineMod loader knobs (modelnet config.py:47-55)
LMO = dict(
    data_folder=LINEMOD_ROOT,
    reload_data=False,
    data_augmentation=True,
    rotated=False,
    rot_factor=1.0,
    augment_noise=0.001,
    points_limit=1000,
    overfit=None,
)

# ModelNet synthetic-pair knobs (modelnet config.py:34-45)
MODELNET = dict(
    num_points=717,
    rotation_magnitude=45.0,
    translation_magnitude=0.5,
    keep_ratio=0.7,
    crop_method="plane",
    asymmetric=True,
    twice_sample=True,
    twice_transform=False,
    noise_magnitude=0.05,
    class_indices="all",
)


def make_cfg() -> GeoTransformerConfig:
    return GeoTransformerConfig(
        seed=7351,
        capacities=CapacityConfig(
            # LineMod clouds capped at 1000 raw pts; level1 voxel 0.006 m,
            # level2 voxel 0.012 m on ~10 cm objects
            points=(1024, 640, 256),
            neighbor_limits=(32, 32, 32),
            gt_candidates=1024,
            correspondence_limit=4096,
            search_chunk=512,
        ),
        backbone=BackboneConfig(
            num_stages=3,
            init_voxel_size=0.003,
            kernel_size=15,
            base_radius=3.0,
            base_sigma=2.0,
            group_norm=32,
            input_dim=1,
            init_dim=64,
            output_dim=256,
            fine_level=0,
        ),
        model=ModelConfig(
            ground_truth_matching_radius=0.005,
            num_points_in_patch=128,
            num_sinkhorn_iterations=100,
        ),
        coarse_matching=CoarseMatchingConfig(
            num_targets=64, overlap_threshold=0.1, num_correspondences=64, dual_normalization=True
        ),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=512,
            hidden_dim=256,
            output_dim=256,
            num_heads=4,
            blocks=("self", "cross", "self", "cross", "self", "cross"),
            sigma_d=0.2,
            sigma_a=15.0,
            angle_k=3,
            reduction_a="max",
        ),
        fine_matching=FineMatchingConfig(
            topk=3,
            acceptance_radius=0.1,
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
            log_scale=24.0,
            positive_overlap=0.1,
        ),
        fine_loss=FineLossConfig(positive_radius=0.05),
        loss=LossWeights(),
        eval=EvalConfig(
            acceptance_overlap=0.0,
            acceptance_radius=0.01,
            inlier_ratio_threshold=0.05,
            rre_threshold=1.0,
            rte_threshold=0.1,
            recall_criterion="rre_rte",
        ),
        ransac=RansacConfig(distance_threshold=0.05, num_points=3, num_iterations=1000),
        # REF_GT_LR / REF_GT_WARMUP support short-horizon fixture/probe runs
        # (reference trains 100k iters with 10k warmup; a CI-scale run would
        # otherwise never leave warmup) — same pattern as the 3dmatch config.
        optim=OptimConfig(
            lr=float(os.environ.get("REF_GT_LR", "1e-4")),
            weight_decay=1e-6,
            grad_acc_steps=1,
            max_iteration=100000,
            snapshot_steps=2000,
            warmup_steps=int(os.environ.get("REF_GT_WARMUP", "10000")),
            eta_init=0.1,
            eta_min=0.1,
        ),
        train=TrainDataConfig(batch_size=1, num_workers=8, point_limit=1000),
        test=TestDataConfig(batch_size=1, num_workers=8, point_limit=1000),
    )
