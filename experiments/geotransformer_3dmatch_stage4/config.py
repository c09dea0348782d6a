"""3DMatch stage4 experiment config.

Value parity: experiments/geotransformer.3dmatch.stage4.gse.k3.max.oacl.
stage2.sinkhorn/config.py:33-141 — every hyperparameter matches; the
additions are the static-shape capacities (per-level point caps sized from
dataset statistics; neighbor limits are the reference's calibrated
[38, 36, 36, 38], demo.py:52-55).
"""

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

import os

_WORKING_DIR = osp.dirname(osp.realpath(__file__))
_ROOT_DIR = osp.dirname(osp.dirname(_WORKING_DIR))
EXP_NAME = osp.basename(_WORKING_DIR)
# REF_GT_OUTPUT_ROOT / REF_GT_3DMATCH_ROOT relocate outputs / the dataset
# (datasets often live on other disks; fixture/e2e runs use temp trees)
OUTPUT_DIR = osp.join(os.environ.get("REF_GT_OUTPUT_ROOT", osp.join(_ROOT_DIR, "output")), EXP_NAME)
SNAPSHOT_DIR = osp.join(OUTPUT_DIR, "snapshots")
LOG_DIR = osp.join(OUTPUT_DIR, "logs")
EVENT_DIR = osp.join(OUTPUT_DIR, "events")
FEATURE_DIR = osp.join(OUTPUT_DIR, "features")
REGISTRATION_DIR = osp.join(OUTPUT_DIR, "registration")
DATASET_ROOT = os.environ.get("REF_GT_3DMATCH_ROOT", osp.join(_ROOT_DIR, "data", "3DMatch"))


def make_cfg(demo: bool = False) -> GeoTransformerConfig:
    """demo=True shrinks the point capacities to the demo pair's pyramid
    (ref 18977 -> 5157 -> 1445 -> 411 points) to cut compile time/memory."""
    capacities = CapacityConfig(
        points=(20480, 6144, 2048, 512) if demo else (30720, 10240, 3072, 1024),
        neighbor_limits=(38, 36, 36, 38),
        # training-label coverage: pairs beyond the cap fall into the
        # ambiguous mask (excluded from negatives), so the cap only trades
        # label completeness for memory — 4096 covers full-size fragments
        gt_candidates=2048 if demo else 4096,
        correspondence_limit=8192,
        search_chunk=2048,
    )
    # REF_GT_NEIGHBOR_LIMITS="32,28,28,32" overrides the calibrated
    # per-level neighbor caps (the gather-volume knob behind the backbone
    # floor; sensitivity study in DESIGN.md r05). The defaults are the
    # reference's keep_ratio-0.8 calibration (utils/data.py:196-221).
    nl_env = os.environ.get("REF_GT_NEIGHBOR_LIMITS")
    if nl_env:
        limits = tuple(int(x) for x in nl_env.split(","))
        assert len(limits) == 4, f"need 4 neighbor limits, got {nl_env}"
        capacities = CapacityConfig(
            points=capacities.points,
            neighbor_limits=limits,
            gt_candidates=capacities.gt_candidates,
            correspondence_limit=capacities.correspondence_limit,
            search_chunk=capacities.search_chunk,
        )
    # REF_GT_CAPS_SCALE shrinks the static point capacities (e.g. 0.1 for
    # fixture-size fragments or fast CI runs); channel dims are untouched
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
            num_stages=4,
            init_voxel_size=0.025,
            kernel_size=15,
            base_radius=2.5,
            base_sigma=2.0,
            group_norm=32,
            input_dim=1,
            init_dim=64,
            output_dim=256,
            fine_level=1,
            # TPU deployment default: bf16 KPConv aggregation (f32
            # accumulation) — train and infer in the same precision
            dtype="bfloat16",
        ),
        model=ModelConfig(
            ground_truth_matching_radius=0.05,
            num_points_in_patch=64,
            num_sinkhorn_iterations=100,
        ),
        coarse_matching=CoarseMatchingConfig(
            num_targets=128,
            overlap_threshold=0.1,
            num_correspondences=256,
            dual_normalization=True,
        ),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=1024,
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
        loss=LossWeights(weight_coarse_loss=1.0, weight_fine_loss=1.0),
        eval=EvalConfig(
            acceptance_overlap=0.0,
            acceptance_radius=0.1,
            inlier_ratio_threshold=0.05,
            rmse_threshold=0.2,
            rre_threshold=15.0,
            rte_threshold=0.3,
        ),
        ransac=RansacConfig(distance_threshold=0.05, num_points=3, num_iterations=1000),
        # REF_GT_LR / REF_GT_LR_DECAY / REF_GT_USE_AUG support overfit-probe
        # runs on fixture trees (constant-lr, no augmentation — the
        # reference's own correctness-probe pattern, modelnet
        # dataset.py:64,92-98); defaults are the reference values
        optim=OptimConfig(
            lr=float(os.environ.get("REF_GT_LR", "1e-4")),
            lr_decay=float(os.environ.get("REF_GT_LR_DECAY", "0.95")),
            lr_decay_steps=1,
            weight_decay=1e-6,
            max_epoch=40,
            grad_acc_steps=1,
        ),
        train=TrainDataConfig(
            batch_size=1,
            num_workers=8,
            point_limit=30000,
            use_augmentation=os.environ.get("REF_GT_USE_AUG", "1") != "0",
            augmentation_noise=0.005,
            augmentation_rotation=1.0,
        ),
        test=TestDataConfig(batch_size=1, num_workers=8, point_limit=None),
    )
