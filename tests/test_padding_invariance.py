"""THE static-shape design contract: enlarging capacities (more padding)
must not change any result on valid slots. A leak anywhere (norm statistics,
attention, matching, Sinkhorn, Procrustes) silently corrupts metrics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.config import CapacityConfig
from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
from ref_geotransformer_tpu.models import GeoTransformer
from tests.utils import tiny_config, synthetic_pair

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier


def build_at_caps(cfg, ref_raw, src_raw, gt):
    caps = cfg.capacities
    ref_p, ref_m = pad_points(ref_raw, caps.points[0])
    src_p, src_m = pad_points(src_raw, caps.points[0])
    return build_registration_inputs(
        jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m),
        cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
        caps.neighbor_limits, caps.points, transform=jnp.array(gt), search_chunk=caps.search_chunk,
    )


def test_model_outputs_invariant_to_padding():
    cfg_small = tiny_config()
    cfg_big = cfg_small.replace(
        capacities=CapacityConfig(
            points=(768, 256, 96),
            neighbor_limits=cfg_small.capacities.neighbor_limits,
            gt_candidates=cfg_small.capacities.gt_candidates,
            correspondence_limit=cfg_small.capacities.correspondence_limit,
            search_chunk=cfg_small.capacities.search_chunk,
        )
    )

    # raw clouds (shared)
    rng = np.random.default_rng(9)
    base = rng.uniform(-0.5, 0.5, (420, 3)).astype(np.float32)
    base[:, 2] = 0.2 * np.sin(4 * base[:, 0])
    ref_raw = base + rng.normal(0, 0.002, base.shape).astype(np.float32)
    src_raw = base[:400] + rng.normal(0, 0.002, (400, 3)).astype(np.float32)
    gt = np.eye(4, dtype=np.float32)

    data_s = build_at_caps(cfg_small, ref_raw, src_raw, gt)
    data_b = build_at_caps(cfg_big, ref_raw, src_raw, gt)

    # pyramid invariance: same valid points per level, in the same order
    for lvl in range(3):
        ms = np.asarray(data_s["ref"]["masks"][lvl])
        mb = np.asarray(data_b["ref"]["masks"][lvl])
        assert ms.sum() == mb.sum(), f"level {lvl} valid count changed"
        np.testing.assert_allclose(
            np.asarray(data_s["ref"]["points"][lvl])[ms],
            np.asarray(data_b["ref"]["points"][lvl])[mb],
            atol=1e-6,
            err_msg=f"level {lvl} points changed",
        )

    model_s = GeoTransformer(cfg_small)
    model_b = GeoTransformer(cfg_big)
    variables = model_s.init({"params": jax.random.key(0), "target": jax.random.key(1)}, data_s)
    # same params apply to both (shapes are capacity-independent)
    out_s = model_s.apply(variables, data_s)
    out_b = model_b.apply(variables, data_b)

    # coarse features on valid nodes must match
    ms = np.asarray(out_s["ref_node_masks"])
    mb = np.asarray(out_b["ref_node_masks"])
    assert ms.sum() == mb.sum()
    np.testing.assert_allclose(
        np.asarray(out_s["ref_feats_c"])[ms], np.asarray(out_b["ref_feats_c"])[mb], atol=2e-4
    )

    # GT overlap map restricted to valid nodes must match
    vs = np.asarray(out_s["gt_node_overlap_map"])[: ms.sum(), :][:, : np.asarray(out_s["src_node_masks"]).sum()]
    vb = np.asarray(out_b["gt_node_overlap_map"])[: mb.sum(), :][:, : np.asarray(out_b["src_node_masks"]).sum()]
    np.testing.assert_allclose(vs, vb, atol=1e-5)

    # final transform must match closely
    np.testing.assert_allclose(
        np.asarray(out_s["estimated_transform"]), np.asarray(out_b["estimated_transform"]), atol=1e-3
    )
