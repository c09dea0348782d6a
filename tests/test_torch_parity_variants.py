"""Full-forward cross-implementation parity for the non-3DMatch variants.

The reference ships three experiment models that differ only in backbone
depth and fine pyramid level:
  * kitti stage5  — 5-stage KPConv-FPN, fine features at level 1
    (experiments/geotransformer.kitti.../backbone.py:8-135, model.py:70-90)
  * modelnet/LineMod — 3-stage FPN, fine features at level 0
    (experiments/geotransformer.modelnet.../backbone.py:8-70, model.py:77-80)
Our single generic KPConvFPN (models/backbone.py) + fine_level config claims
to reproduce all three; test_torch_parity.py proves the 3DMatch stage4
instance, this file proves the other two on identical inputs with converted
random-init weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import torch_ref  # noqa: E402

torch_ref.ref_modules()


def _make_variant_cfg(num_stages: int):
    """Scaled-down hyperparameters shared by both implementations; structure
    mirrors the reference experiment configs (kitti config.py:76-126,
    modelnet config.py:96-146), dims shrunk for CPU speed."""
    NS = torch_ref.NS
    d = 16
    coarse_dim = d * (2 ** num_stages)
    cfg = NS()
    cfg.model = NS(
        ground_truth_matching_radius=0.05,
        num_points_in_patch=16,
        num_sinkhorn_iterations=100,
    )
    cfg.backbone = NS(
        num_stages=num_stages,
        init_voxel_size=0.025,
        kernel_size=15,
        base_radius=2.5,
        base_sigma=2.0,
        init_radius=0.0625,
        init_sigma=0.05,
        group_norm=8,
        input_dim=1,
        init_dim=d,
        output_dim=64,
    )
    cfg.geotransformer = NS(
        input_dim=coarse_dim,
        hidden_dim=64,
        output_dim=128,
        num_heads=4,
        blocks=["self", "cross", "self", "cross", "self", "cross"],
        sigma_d=0.2 * (2 ** (num_stages - 4)),
        sigma_a=15,
        angle_k=3,
        reduction_a="max",
    )
    cfg.coarse_matching = NS(
        num_targets=32,
        overlap_threshold=0.1,
        num_correspondences=48,
        dual_normalization=True,
    )
    cfg.fine_matching = NS(
        topk=3,
        acceptance_radius=0.1,
        mutual=True,
        confidence_threshold=0.05,
        use_dustbin=False,
        use_global_score=False,
        correspondence_threshold=3,
        correspondence_limit=None,
        num_refinement_steps=5,
    )
    return cfg


def _run_both(variant: str, num_stages: int, fine_level: int, capacities, neighbor_limits):
    from scipy.spatial.transform import Rotation

    from tests.test_torch_parity import _jax_parity_config

    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.models import GeoTransformer

    pcfg = _make_variant_cfg(num_stages)
    jcfg = _jax_parity_config(pcfg, capacities, neighbor_limits, fine_level=fine_level)

    # synthetic surface sized so every pyramid level stays populated: domain
    # grows with depth (coarsest voxel = 0.025 * 2^(S-1))
    side = 0.6 if num_stages <= 4 else 1.2
    n_base = 900 if num_stages <= 4 else 2000
    rng = np.random.default_rng(1234 + num_stages)
    base = rng.uniform(0.0, side, (n_base, 3)).astype(np.float32)
    base[:, 2] = 0.5 * side * (0.5 + 0.25 * np.sin(8.0 * base[:, 0] / side) + 0.33 * (base[:, 1] / side) ** 2)

    rot = Rotation.from_euler("xyz", rng.uniform(-25, 25, 3), degrees=True).as_matrix()
    t = rng.uniform(-0.1, 0.1, 3)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = rot.astype(np.float32)
    gt[:3, 3] = t.astype(np.float32)

    n_take = int(n_base * 0.78)
    ref_raw = base[rng.choice(n_base, n_take, replace=False)] + rng.normal(0, 0.002, (n_take, 3)).astype(np.float32)
    src_raw = ((base[rng.choice(n_base, n_take, replace=False)] - gt[:3, 3]) @ gt[:3, :3]).astype(np.float32)
    src_raw += rng.normal(0, 0.002, src_raw.shape).astype(np.float32)

    ref_p, ref_m = pad_points(ref_raw.astype(np.float32), capacities[0])
    src_p, src_m = pad_points(src_raw, capacities[0])
    data = build_registration_inputs(
        jnp.asarray(ref_p), jnp.asarray(ref_m), jnp.asarray(src_p), jnp.asarray(src_m),
        jcfg.backbone.num_stages, jcfg.backbone.init_voxel_size, jcfg.backbone.init_radius,
        neighbor_limits, capacities, transform=jnp.asarray(gt),
        search_chunk=jcfg.capacities.search_chunk,
    )

    torch_data = torch_ref.stacked_data_from_ours(data, gt)
    # every level populated? (a dead level would vacuously pass)
    for lvl, lengths in enumerate(torch_data["lengths"]):
        assert int(lengths.min()) >= (2 if lvl == len(capacities) - 1 else 8), (
            f"level {lvl} underpopulated: {lengths}"
        )

    model_mod = torch_ref.ref_experiment_variant(variant)
    torch.manual_seed(11)
    ref_model = model_mod.GeoTransformer(pcfg).eval()
    with torch.no_grad():
        theirs = ref_model(torch_data)

    variables = torch_ref.torch_state_to_variables(ref_model)
    ours_model = GeoTransformer(jcfg)
    init_vars = ours_model.init({"params": jax.random.key(0), "target": jax.random.key(1)}, data)
    torch_ref.assert_tree_shapes_match(variables["params"], init_vars["params"], "params")
    torch_ref.assert_tree_shapes_match(variables["buffers"], init_vars["buffers"], "buffers")
    ours = ours_model.apply(variables, data)

    counts = {
        "nr": [int(np.asarray(m).sum()) for m in data["ref"]["masks"]],
        "ns": [int(np.asarray(m).sum()) for m in data["src"]["masks"]],
    }
    return ours, theirs, counts, jcfg


def _assert_forward_parity(ours, theirs, counts, jcfg):
    from tests.test_torch_parity import allclose

    f = jcfg.backbone.fine_level
    allclose(np.asarray(ours["ref_feats_f"])[: counts["nr"][f]], theirs["ref_feats_f"],
             atol=1e-4, name="ref_feats_f")
    allclose(np.asarray(ours["src_feats_f"])[: counts["ns"][f]], theirs["src_feats_f"],
             atol=1e-4, name="src_feats_f")
    allclose(np.asarray(ours["ref_feats_c"])[: counts["nr"][-1]], theirs["ref_feats_c"],
             atol=1e-4, name="ref_feats_c")
    allclose(np.asarray(ours["src_feats_c"])[: counts["ns"][-1]], theirs["src_feats_c"],
             atol=1e-4, name="src_feats_c")

    # node proposals agree as sets
    ours_pairs = sorted(zip(
        np.asarray(ours["ref_node_corr_indices"]).tolist(),
        np.asarray(ours["src_node_corr_indices"]).tolist(),
    ))
    theirs_pairs = sorted(zip(
        theirs["ref_node_corr_indices"].numpy().tolist(),
        theirs["src_node_corr_indices"].numpy().tolist(),
    ))
    assert ours_pairs == theirs_pairs

    # final estimated transform
    allclose(np.asarray(ours["estimated_transform"]), theirs["estimated_transform"],
             atol=5e-4, name="estimated_transform")


@pytest.mark.slow
def test_kitti_stage5_full_forward_parity():
    """5-stage FPN + fine level 1 (kitti backbone.py:8-135)."""
    ours, theirs, counts, jcfg = _run_both(
        "kitti", num_stages=5, fine_level=1,
        capacities=(2048, 2048, 768, 256, 64),
        neighbor_limits=(30, 30, 30, 30, 30),
    )
    _assert_forward_parity(ours, theirs, counts, jcfg)


@pytest.mark.slow
def test_modelnet_3stage_full_forward_parity():
    """3-stage FPN + fine level 0 (modelnet backbone.py:8-70, model.py:77-80)."""
    ours, theirs, counts, jcfg = _run_both(
        "modelnet", num_stages=3, fine_level=0,
        capacities=(1024, 512, 160),
        neighbor_limits=(30, 30, 30),
    )
    _assert_forward_parity(ours, theirs, counts, jcfg)
