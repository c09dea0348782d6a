"""Shared test helpers: tiny config + synthetic registration pairs."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from ref_geotransformer_tpu.config import (
    BackboneConfig,
    CapacityConfig,
    CoarseMatchingConfig,
    GeoTransformerConfig,
    GeoTransformerModuleConfig,
    ModelConfig,
)
from ref_geotransformer_tpu.data import build_registration_inputs, pad_points


def tiny_config() -> GeoTransformerConfig:
    """3-stage toy config that runs in seconds on CPU."""
    return GeoTransformerConfig(
        capacities=CapacityConfig(
            points=(512, 192, 64),
            neighbor_limits=(16, 16, 16),
            gt_candidates=256,
            correspondence_limit=512,
            search_chunk=256,
        ),
        backbone=BackboneConfig(
            num_stages=3,
            init_voxel_size=0.05,
            kernel_size=15,
            base_radius=2.5,
            base_sigma=2.0,
            group_norm=8,
            input_dim=1,
            init_dim=16,
            output_dim=64,
            fine_level=1,
        ),
        model=ModelConfig(ground_truth_matching_radius=0.1, num_points_in_patch=16, num_sinkhorn_iterations=20),
        coarse_matching=CoarseMatchingConfig(num_targets=32, overlap_threshold=0.1, num_correspondences=48),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=128, hidden_dim=48, output_dim=64, num_heads=4,
            blocks=("self", "cross", "self", "cross"), sigma_d=0.2, sigma_a=15.0, angle_k=3,
        ),
    )


def synthetic_pair(cfg: GeoTransformerConfig, n_ref=400, n_src=380, seed=0, overlap=0.7):
    """Random surface-ish cloud + rigid transform; returns (data dict, gt 4x4)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-0.5, 0.5, (600, 3)).astype(np.float32)
    base[:, 2] = 0.2 * np.sin(4 * base[:, 0]) + 0.1 * base[:, 1] ** 2  # a surface

    rot = Rotation.from_euler("xyz", rng.uniform(-30, 30, 3), degrees=True).as_matrix().astype(np.float32)
    t = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = rot
    gt[:3, 3] = t

    ref_raw = base[rng.choice(600, n_ref, replace=False)]
    src_sel = base[rng.choice(int(600 * overlap) + (600 - int(600 * overlap)), n_src, replace=False)]
    # src in its own frame: src = R^-1 (ref - t)
    src_raw = (src_sel - t) @ rot  # (R^T applied on the right == R^-1 rows)
    ref_raw = ref_raw + rng.normal(0, 0.002, ref_raw.shape).astype(np.float32)
    src_raw = src_raw.astype(np.float32) + rng.normal(0, 0.002, src_raw.shape).astype(np.float32)

    cap0 = cfg.capacities.points[0]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)
    data = build_registration_inputs(
        jnp.array(ref_p),
        jnp.array(ref_m),
        jnp.array(src_p),
        jnp.array(src_m),
        cfg.backbone.num_stages,
        cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius,
        cfg.capacities.neighbor_limits,
        cfg.capacities.points,
        transform=jnp.array(gt),
        search_chunk=cfg.capacities.search_chunk,
    )
    return data, gt
