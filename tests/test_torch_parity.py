"""Cross-implementation numerical parity: reference PyTorch modules
(random-init, state dict converted via utils/convert_checkpoint.py) vs our
flax/JAX modules, on identical inputs. CPU backend, fp32.

These tests are the evidence behind every "reference-exact" claim in the
docstrings: any future numeric drift in our modules fails here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import torch_ref  # noqa: E402

torch_ref.ref_modules()  # put /root/reference on sys.path with stubs installed

ATOL = 2e-5
RTOL = 2e-5


@pytest.fixture(scope="module", autouse=True)
def _seed():
    torch.manual_seed(7)
    np.random.seed(7)


def allclose(ours, theirs, atol=ATOL, rtol=RTOL, name=""):
    ours = np.asarray(ours, np.float64)
    theirs = theirs.detach().cpu().numpy().astype(np.float64)
    assert ours.shape == theirs.shape, f"{name}: shape {ours.shape} vs {theirs.shape}"
    err = np.max(np.abs(ours - theirs) / (np.abs(theirs) * rtol / atol + 1.0))
    assert err <= atol, f"{name}: max scaled error {err:.3e} > {atol}"


# ---------------------------------------------------------------------------
# KPConv (modules/kpconv/kpconv.py:79-122 vs models/kpconv.py:62-143)
# ---------------------------------------------------------------------------


def test_kpconv_parity():
    from geotransformer.modules.kpconv.kpconv import KPConv as TorchKPConv

    from ref_geotransformer_tpu.models.kpconv import KPConv

    n, m, h, cin, cout = 60, 40, 12, 5, 8
    radius, sigma = 0.0625, 0.05
    ref_conv = TorchKPConv(cin, cout, 15, radius, sigma).eval()

    rng = np.random.default_rng(0)
    s_points = rng.uniform(0, 0.3, (n, 3)).astype(np.float32)
    q_points = rng.uniform(0, 0.3, (m, 3)).astype(np.float32)
    s_feats = rng.normal(size=(n, cin)).astype(np.float32)
    # neighbor table with some shadow (== n) slots, like a padded search
    neighbors = rng.integers(0, n, (m, h))
    neighbors[rng.uniform(size=(m, h)) < 0.2] = n

    with torch.no_grad():
        theirs = ref_conv(
            torch.from_numpy(s_feats),
            torch.from_numpy(q_points),
            torch.from_numpy(s_points),
            torch.from_numpy(neighbors),
        )

    ours_mod = KPConv(cin, cout, 15, radius, sigma)
    variables = torch_ref.torch_state_to_variables(ref_conv)
    ours = ours_mod.apply(
        variables, jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
        jnp.asarray(neighbors),
    )
    allclose(ours, theirs, name="kpconv")


def test_residual_block_parity():
    from geotransformer.modules.kpconv.modules import ResidualBlock as TorchResidualBlock

    from ref_geotransformer_tpu.models.kpconv import ResidualBlock

    n, m, h = 64, 32, 10
    cin, cout = 16, 32
    ref_block = TorchResidualBlock(cin, cout, 15, 0.0625, 0.05, group_norm=8, strided=True).eval()

    rng = np.random.default_rng(1)
    s_points = rng.uniform(0, 0.3, (n, 3)).astype(np.float32)
    q_points = rng.uniform(0, 0.3, (m, 3)).astype(np.float32)
    s_feats = rng.normal(size=(n, cin)).astype(np.float32)
    neighbors = rng.integers(0, n, (m, h))
    neighbors[rng.uniform(size=(m, h)) < 0.2] = n

    with torch.no_grad():
        theirs = ref_block(
            torch.from_numpy(s_feats),
            torch.from_numpy(q_points),
            torch.from_numpy(s_points),
            torch.from_numpy(neighbors),
        )

    ours_mod = ResidualBlock(cin, cout, 15, 0.0625, 0.05, group_norm=8, strided=True)
    variables = torch_ref.torch_state_to_variables(ref_block)
    ours = ours_mod.apply(
        variables, jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
        jnp.asarray(neighbors),
    )
    allclose(ours, theirs, name="residual_block")


# ---------------------------------------------------------------------------
# Geometric structure embedding (modules/geotransformer/geotransformer.py:9-72)
# ---------------------------------------------------------------------------


def test_geometric_structure_embedding_parity():
    from geotransformer.modules.geotransformer.geotransformer import (
        GeometricStructureEmbedding as TorchGSE,
    )

    from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding

    hidden, k = 64, 3
    ref_gse = TorchGSE(hidden, 0.2, 15, k, reduction_a="max").eval()
    rng = np.random.default_rng(2)
    points = rng.uniform(0, 1.0, (1, 40, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = ref_gse(torch.from_numpy(points))

    ours_mod = GeometricStructureEmbedding(hidden, 0.2, 15.0, k, "max", use_pallas=False)
    variables = torch_ref.torch_state_to_variables(ref_gse)
    ours = ours_mod.apply(variables, jnp.asarray(points))
    allclose(ours, theirs, name="gse")


# ---------------------------------------------------------------------------
# RPE transformer layer (modules/transformer/rpe_transformer.py:18-131)
# ---------------------------------------------------------------------------


def test_rpe_transformer_layer_parity():
    from geotransformer.modules.transformer.rpe_transformer import (
        RPETransformerLayer as TorchRPELayer,
    )

    from ref_geotransformer_tpu.models.attention import RPETransformerLayer

    d_model, heads, n, m = 64, 4, 20, 24
    ref_layer = TorchRPELayer(d_model, heads).eval()

    rng = np.random.default_rng(3)
    q = rng.normal(size=(1, n, d_model)).astype(np.float32)
    mem = rng.normal(size=(1, m, d_model)).astype(np.float32)
    emb = rng.normal(size=(1, n, m, d_model)).astype(np.float32)
    valid = rng.uniform(size=(1, m)) > 0.2

    with torch.no_grad():
        theirs, _ = ref_layer(
            torch.from_numpy(q), torch.from_numpy(mem), torch.from_numpy(emb),
            memory_masks=torch.from_numpy(~valid),  # reference: True = ignored
        )

    ours_mod = RPETransformerLayer(d_model, heads)
    variables = torch_ref.torch_state_to_variables(ref_layer)
    ours, _ = ours_mod.apply(
        variables, jnp.asarray(q), jnp.asarray(mem), jnp.asarray(emb),
        memory_masks=jnp.asarray(valid),  # ours: True = attend
    )
    allclose(ours, theirs, name="rpe_layer")


def test_vanilla_transformer_layer_parity():
    from geotransformer.modules.transformer.vanilla_transformer import (
        TransformerLayer as TorchLayer,
    )

    from ref_geotransformer_tpu.models.attention import TransformerLayer

    d_model, heads, n, m = 64, 4, 18, 22
    ref_layer = TorchLayer(d_model, heads).eval()
    rng = np.random.default_rng(4)
    q = rng.normal(size=(1, n, d_model)).astype(np.float32)
    mem = rng.normal(size=(1, m, d_model)).astype(np.float32)
    valid = rng.uniform(size=(1, m)) > 0.2

    with torch.no_grad():
        theirs, _ = ref_layer(
            torch.from_numpy(q), torch.from_numpy(mem), memory_masks=torch.from_numpy(~valid)
        )
    ours_mod = TransformerLayer(d_model, heads)
    variables = torch_ref.torch_state_to_variables(ref_layer)
    ours, _ = ours_mod.apply(
        variables, jnp.asarray(q), jnp.asarray(mem), memory_masks=jnp.asarray(valid)
    )
    allclose(ours, theirs, name="vanilla_layer")


# ---------------------------------------------------------------------------
# Sinkhorn OT (modules/sinkhorn/learnable_sinkhorn.py:20-66)
# ---------------------------------------------------------------------------


def test_sinkhorn_parity():
    from geotransformer.modules.sinkhorn import LearnableLogOptimalTransport as TorchOT

    from ref_geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

    ref_ot = TorchOT(num_iterations=100).eval()
    with torch.no_grad():
        ref_ot.alpha.fill_(0.7)

    rng = np.random.default_rng(5)
    b, m, n = 3, 12, 10
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    row_valid = rng.uniform(size=(b, m)) > 0.25
    col_valid = rng.uniform(size=(b, n)) > 0.25
    row_valid[:, 0] = True
    col_valid[:, 0] = True

    with torch.no_grad():
        theirs = ref_ot(
            torch.from_numpy(scores),
            row_masks=torch.from_numpy(row_valid),  # reference masks here ARE validity
            col_masks=torch.from_numpy(col_valid),
        )

    ours_mod = LearnableLogOptimalTransport(100, use_pallas=False)
    variables = torch_ref.torch_state_to_variables(ref_ot)
    ours = ours_mod.apply(
        variables, jnp.asarray(scores), jnp.asarray(row_valid), jnp.asarray(col_valid)
    )
    # compare only entries that are valid on both axes (the reference leaves
    # -inf-masked garbage in invalid slots; we fill with -inf too but the
    # dustbin row/col of fully-masked batches differs harmlessly)
    pad_row = np.concatenate([row_valid, np.ones((b, 1), bool)], axis=1)
    pad_col = np.concatenate([col_valid, np.ones((b, 1), bool)], axis=1)
    sel = pad_row[:, :, None] & pad_col[:, None, :]
    allclose(np.asarray(ours)[sel], theirs[torch.from_numpy(sel)], name="sinkhorn")


# ---------------------------------------------------------------------------
# Weighted Procrustes (modules/registration/procrustes.py:6-73)
# ---------------------------------------------------------------------------


def test_weighted_procrustes_parity():
    from geotransformer.modules.registration.procrustes import weighted_procrustes as torch_wp

    from ref_geotransformer_tpu.models.procrustes import weighted_procrustes

    rng = np.random.default_rng(6)
    n = 30
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    w = rng.uniform(0, 1, (n,)).astype(np.float32)
    w[rng.uniform(size=n) < 0.3] = 0.0

    theirs = torch_wp(
        torch.from_numpy(src), torch.from_numpy(ref), torch.from_numpy(w), return_transform=True
    )
    ours = weighted_procrustes(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w))
    allclose(ours, theirs, atol=1e-4, name="procrustes")


# ---------------------------------------------------------------------------
# Superpoint matching (modules/geotransformer/superpoint_matching.py:7-51)
# ---------------------------------------------------------------------------


def test_superpoint_matching_parity():
    from geotransformer.modules.geotransformer import SuperPointMatching

    from ref_geotransformer_tpu.models.matching import superpoint_matching

    rng = np.random.default_rng(7)
    m, n, c, k = 40, 36, 16, 24
    ref_feats = rng.normal(size=(m, c)).astype(np.float32)
    src_feats = rng.normal(size=(n, c)).astype(np.float32)
    ref_feats /= np.linalg.norm(ref_feats, axis=1, keepdims=True)
    src_feats /= np.linalg.norm(src_feats, axis=1, keepdims=True)
    ref_valid = rng.uniform(size=m) > 0.2
    src_valid = rng.uniform(size=n) > 0.2

    ref_module = SuperPointMatching(k, dual_normalization=True)
    with torch.no_grad():
        t_ref_idx, t_src_idx, t_scores = ref_module(
            torch.from_numpy(ref_feats), torch.from_numpy(src_feats),
            torch.from_numpy(ref_valid), torch.from_numpy(src_valid),
        )

    o_ref_idx, o_src_idx, o_scores = superpoint_matching(
        jnp.asarray(ref_feats), jnp.asarray(src_feats), jnp.asarray(ref_valid),
        jnp.asarray(src_valid), k, True,
    )

    ours_pairs = sorted(zip(np.asarray(o_ref_idx).tolist(), np.asarray(o_src_idx).tolist()))
    theirs_pairs = sorted(zip(t_ref_idx.numpy().tolist(), t_src_idx.numpy().tolist()))
    assert ours_pairs == theirs_pairs
    allclose(np.sort(np.asarray(o_scores)), torch.sort(t_scores)[0], name="matching_scores")


# ---------------------------------------------------------------------------
# Circle loss (modules/loss/circle_loss.py:44-88)
# ---------------------------------------------------------------------------


def test_weighted_circle_loss_parity():
    from geotransformer.modules.loss.circle_loss import weighted_circle_loss as torch_wcl

    from ref_geotransformer_tpu.models.losses import weighted_circle_loss

    rng = np.random.default_rng(8)
    m, n = 25, 30
    dists = rng.uniform(0, 2, (m, n)).astype(np.float32)
    pos = rng.uniform(size=(m, n)) < 0.15
    neg = np.logical_and(~pos, rng.uniform(size=(m, n)) < 0.5)
    scales = rng.uniform(0, 1, (m, n)).astype(np.float32)

    theirs = torch_wcl(
        torch.from_numpy(pos), torch.from_numpy(neg), torch.from_numpy(dists),
        0.1, 1.4, 0.1, 1.4, 24, pos_scales=torch.from_numpy(scales),
    )
    ours = weighted_circle_loss(
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(dists),
        0.1, 1.4, 0.1, 1.4, 24.0, pos_scales=jnp.asarray(scales),
    )
    allclose(np.asarray(ours), theirs, name="circle_loss")


# ---------------------------------------------------------------------------
# Full-forward parity (experiments/geotransformer.3dmatch.../model.py:69-212)
# ---------------------------------------------------------------------------


def _jax_parity_config(pcfg, capacities, neighbor_limits, fine_level=1):
    from ref_geotransformer_tpu.config import (
        BackboneConfig,
        CapacityConfig,
        CoarseMatchingConfig,
        FineMatchingConfig,
        GeoTransformerConfig,
        GeoTransformerModuleConfig,
        ModelConfig,
    )

    return GeoTransformerConfig(
        capacities=CapacityConfig(
            points=capacities,
            neighbor_limits=neighbor_limits,
            gt_candidates=4096,
            correspondence_limit=2048,
            search_chunk=512,
        ),
        backbone=BackboneConfig(
            num_stages=pcfg.backbone.num_stages,
            init_voxel_size=pcfg.backbone.init_voxel_size,
            kernel_size=pcfg.backbone.kernel_size,
            base_radius=pcfg.backbone.base_radius,
            base_sigma=pcfg.backbone.base_sigma,
            group_norm=pcfg.backbone.group_norm,
            input_dim=pcfg.backbone.input_dim,
            init_dim=pcfg.backbone.init_dim,
            output_dim=pcfg.backbone.output_dim,
            fine_level=fine_level,
            dtype="float32",
        ),
        model=ModelConfig(
            ground_truth_matching_radius=pcfg.model.ground_truth_matching_radius,
            num_points_in_patch=pcfg.model.num_points_in_patch,
            num_sinkhorn_iterations=pcfg.model.num_sinkhorn_iterations,
        ),
        coarse_matching=CoarseMatchingConfig(
            num_targets=pcfg.coarse_matching.num_targets,
            overlap_threshold=pcfg.coarse_matching.overlap_threshold,
            num_correspondences=pcfg.coarse_matching.num_correspondences,
            dual_normalization=pcfg.coarse_matching.dual_normalization,
        ),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=pcfg.geotransformer.input_dim,
            hidden_dim=pcfg.geotransformer.hidden_dim,
            output_dim=pcfg.geotransformer.output_dim,
            num_heads=pcfg.geotransformer.num_heads,
            blocks=tuple(pcfg.geotransformer.blocks),
            sigma_d=pcfg.geotransformer.sigma_d,
            sigma_a=pcfg.geotransformer.sigma_a,
            angle_k=pcfg.geotransformer.angle_k,
            reduction_a=pcfg.geotransformer.reduction_a,
        ),
        fine_matching=FineMatchingConfig(
            topk=pcfg.fine_matching.topk,
            acceptance_radius=pcfg.fine_matching.acceptance_radius,
            mutual=pcfg.fine_matching.mutual,
            confidence_threshold=pcfg.fine_matching.confidence_threshold,
            use_dustbin=pcfg.fine_matching.use_dustbin,
            use_global_score=pcfg.fine_matching.use_global_score,
            correspondence_threshold=pcfg.fine_matching.correspondence_threshold,
            num_refinement_steps=pcfg.fine_matching.num_refinement_steps,
        ),
    )


@pytest.fixture(scope="module")
def full_forward_outputs():
    """Run the reference experiment model and ours on identical inputs
    (identical pyramid tables, converted random-init weights); yields both
    output dicts plus the valid counts."""
    from scipy.spatial.transform import Rotation

    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.models import GeoTransformer

    pcfg = torch_ref.make_parity_cfg()
    capacities = (1024, 1024, 384, 64)
    neighbor_limits = (30, 30, 30, 30)
    jcfg = _jax_parity_config(pcfg, capacities, neighbor_limits)

    # synthetic pair: a noisy surface in [0, 0.6]^3 so every pyramid level is
    # populated (~27 coarse nodes at voxel 0.2)
    rng = np.random.default_rng(42)
    base = rng.uniform(0.0, 0.6, (900, 3)).astype(np.float32)
    base[:, 2] = 0.3 + 0.15 * np.sin(8.0 * base[:, 0]) + 0.2 * base[:, 1] ** 2

    rot = Rotation.from_euler("xyz", rng.uniform(-25, 25, 3), degrees=True).as_matrix()
    t = rng.uniform(-0.1, 0.1, 3)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = rot.astype(np.float32)
    gt[:3, 3] = t.astype(np.float32)

    ref_raw = base[rng.choice(900, 700, replace=False)] + rng.normal(0, 0.002, (700, 3)).astype(np.float32)
    src_raw = ((base[rng.choice(900, 680, replace=False)] - gt[:3, 3]) @ gt[:3, :3]).astype(np.float32)
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

    model_mod = torch_ref.ref_experiment()
    torch.manual_seed(11)
    ref_model = model_mod.GeoTransformer(pcfg).eval()
    with torch.no_grad():
        theirs = ref_model(torch_data)

    variables = torch_ref.torch_state_to_variables(ref_model)
    ours_model = GeoTransformer(jcfg)
    init_vars = ours_model.init(
        {"params": jax.random.key(0), "target": jax.random.key(1)}, data
    )
    torch_ref.assert_tree_shapes_match(variables["params"], init_vars["params"], "params")
    torch_ref.assert_tree_shapes_match(variables["buffers"], init_vars["buffers"], "buffers")
    ours = ours_model.apply(variables, data)

    counts = {
        "nr": [int(np.asarray(m).sum()) for m in data["ref"]["masks"]],
        "ns": [int(np.asarray(m).sum()) for m in data["src"]["masks"]],
    }
    return ours, theirs, counts, jcfg


@pytest.mark.slow
def test_full_forward_backbone_parity(full_forward_outputs):
    ours, theirs, counts, jcfg = full_forward_outputs
    f = jcfg.backbone.fine_level
    allclose(
        np.asarray(ours["ref_feats_f"])[: counts["nr"][f]], theirs["ref_feats_f"],
        atol=1e-4, name="ref_feats_f",
    )
    allclose(
        np.asarray(ours["src_feats_f"])[: counts["ns"][f]], theirs["src_feats_f"],
        atol=1e-4, name="src_feats_f",
    )


@pytest.mark.slow
def test_full_forward_coarse_feats_parity(full_forward_outputs):
    ours, theirs, counts, _ = full_forward_outputs
    allclose(
        np.asarray(ours["ref_feats_c"])[: counts["nr"][-1]], theirs["ref_feats_c"],
        atol=1e-4, name="ref_feats_c",
    )
    allclose(
        np.asarray(ours["src_feats_c"])[: counts["ns"][-1]], theirs["src_feats_c"],
        atol=1e-4, name="src_feats_c",
    )


@pytest.mark.slow
def test_full_forward_proposals_parity(full_forward_outputs):
    ours, theirs, _, _ = full_forward_outputs
    ours_pairs = sorted(
        zip(
            np.asarray(ours["ref_node_corr_indices"]).tolist(),
            np.asarray(ours["src_node_corr_indices"]).tolist(),
        )
    )
    theirs_pairs = sorted(
        zip(
            theirs["ref_node_corr_indices"].numpy().tolist(),
            theirs["src_node_corr_indices"].numpy().tolist(),
        )
    )
    assert ours_pairs == theirs_pairs


@pytest.mark.slow
def test_full_forward_matching_scores_parity(full_forward_outputs):
    ours, theirs, _, jcfg = full_forward_outputs
    n_nodes = jcfg.capacities.points[-1]

    def order(ref_idx, src_idx):
        return np.argsort(np.asarray(ref_idx) * n_nodes + np.asarray(src_idx))

    ours_order = order(ours["ref_node_corr_indices"], ours["src_node_corr_indices"])
    theirs_order = order(
        theirs["ref_node_corr_indices"].numpy(), theirs["src_node_corr_indices"].numpy()
    )
    ours_scores = np.asarray(ours["matching_scores"])[ours_order]
    theirs_scores = theirs["matching_scores"].numpy()[theirs_order]
    # compare on slots valid in both (our padded patch slots hold the
    # sentinel-fill convention; the reference's hold its shadow fill)
    ours_masks = np.concatenate(
        [
            np.asarray(ours["ref_node_corr_knn_masks"])[ours_order],
            np.ones((len(ours_order), 1), bool),
        ],
        axis=1,
    )
    src_masks = np.concatenate(
        [
            np.asarray(ours["src_node_corr_knn_masks"])[ours_order],
            np.ones((len(ours_order), 1), bool),
        ],
        axis=1,
    )
    sel = ours_masks[:, :, None] & src_masks[:, None, :]
    err = np.max(np.abs(np.where(sel, ours_scores - theirs_scores, 0.0)))
    assert err < 1e-3, f"matching scores max abs err {err:.3e}"


@pytest.mark.slow
def test_full_forward_transform_parity(full_forward_outputs):
    from ref_geotransformer_tpu.ops.metrics import isotropic_transform_error

    ours, theirs, _, _ = full_forward_outputs
    ours_tf = jnp.asarray(np.asarray(ours["estimated_transform"], np.float32))
    theirs_tf = jnp.asarray(theirs["estimated_transform"].numpy())
    rre, rte = (float(v) for v in isotropic_transform_error(ours_tf, theirs_tf))
    assert rre < 0.05, f"estimated transforms diverge: RRE {rre:.4f} deg"
    assert rte < 1e-3, f"estimated transforms diverge: RTE {rte:.5f}"


@pytest.mark.slow
def test_full_forward_gt_correspondences_parity(full_forward_outputs):
    ours, theirs, _, _ = full_forward_outputs
    overlap = np.asarray(ours["gt_node_overlap_map"])
    ambiguous = np.asarray(ours["gt_node_ambiguous_map"])
    t_idx = theirs["gt_node_corr_indices"].numpy()
    t_ov = theirs["gt_node_corr_overlaps"].numpy()
    dense_theirs = np.zeros_like(overlap)
    dense_theirs[t_idx[:, 0], t_idx[:, 1]] = t_ov
    sel = ~ambiguous
    err = np.max(np.abs(np.where(sel, overlap - dense_theirs, 0.0)))
    assert err < 1e-5, f"gt overlap map max err {err:.2e}"


# ---------------------------------------------------------------------------
# point_to_node partition + GT node correspondences
# (modules/ops/pointcloud_partition.py, modules/registration/matching.py)
# ---------------------------------------------------------------------------


def test_point_to_node_partition_parity():
    from geotransformer.modules.ops import point_to_node_partition as torch_p2n

    from ref_geotransformer_tpu.ops.partition import point_to_node_partition

    rng = np.random.default_rng(9)
    n, m, k = 100, 12, 8
    points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    nodes = rng.uniform(0, 1, (m, 3)).astype(np.float32)

    with torch.no_grad():
        _, t_node_masks, t_knn_idx, t_knn_masks = torch_p2n(
            torch.from_numpy(points), torch.from_numpy(nodes), k
        )

    _, o_node_masks, o_knn_idx, o_knn_masks = point_to_node_partition(
        jnp.asarray(points), jnp.asarray(nodes), k,
        jnp.ones(n, bool), jnp.ones(m, bool),
    )

    assert np.array_equal(np.asarray(o_node_masks), t_node_masks.numpy())
    assert np.array_equal(np.asarray(o_knn_masks), t_knn_masks.numpy())
    # indices must agree wherever the slot is valid (invalid slots are
    # sentinel/shadow by different conventions)
    o_idx = np.asarray(o_knn_idx)
    t_idx = t_knn_idx.numpy()
    valid = t_knn_masks.numpy()
    assert np.array_equal(
        np.sort(np.where(valid, o_idx, -1), axis=1), np.sort(np.where(valid, t_idx, -1), axis=1)
    )


@pytest.mark.slow
def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """End-to-end pretrained-weight import path: a full-scale reference
    .pth.tar (random init, the published checkpoints' exact tree) ->
    `python -m ref_geotransformer_tpu.utils.convert_checkpoint` with
    structural validation -> orbax snapshot -> CheckpointManager.load_model
    round-trips bit-exactly."""
    import os
    import subprocess
    import sys as _sys

    import torch

    model_mod = torch_ref.ref_experiment()

    # full 3DMatch stage4 dims (experiments/geotransformer.3dmatch.../
    # config.py:63-121) so validation against our experiment config passes
    pcfg = torch_ref.make_parity_cfg()
    pcfg.backbone.init_dim = 64
    pcfg.backbone.output_dim = 256
    pcfg.backbone.group_norm = 32
    pcfg.model.num_points_in_patch = 64
    pcfg.geotransformer.input_dim = 1024
    pcfg.geotransformer.hidden_dim = 256
    pcfg.geotransformer.output_dim = 256
    pcfg.coarse_matching.num_targets = 128
    pcfg.coarse_matching.num_correspondences = 256

    torch.manual_seed(3)
    ref_model = model_mod.GeoTransformer(pcfg)
    ckpt_path = tmp_path / "epoch-40.pth.tar"
    torch.save({"model": ref_model.state_dict()}, ckpt_path)

    snap_dir = tmp_path / "snapshots"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [_sys.executable, "-m", "ref_geotransformer_tpu.utils.convert_checkpoint",
         str(ckpt_path), str(snap_dir), "--experiment", "3dmatch"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "structure matches the '3dmatch' model" in out.stdout

    # reload through the trainer/tester path and compare against a direct
    # in-process conversion
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments", "geotransformer_3dmatch_stage4"))
    from config import make_cfg

    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
    from ref_geotransformer_tpu.models import GeoTransformer as OursGT, init_model_variables

    cfg = make_cfg()
    init_vars = init_model_variables(OursGT(cfg), cfg, jax.random.key(0))
    restored = CheckpointManager(str(snap_dir)).load_model(
        "epoch-40", init_vars["params"], init_vars["buffers"])

    expected = torch_ref.torch_state_to_variables(ref_model)
    for path, leaf in torch_ref.flat_paths(expected["params"]):
        got = restored["params"]
        for k in path:
            got = got[k]
        np.testing.assert_array_equal(np.asarray(got), leaf, err_msg="/".join(path))
