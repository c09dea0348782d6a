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
