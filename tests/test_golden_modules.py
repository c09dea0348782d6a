"""Golden-value tests: hand-derived expected outputs for the core modules
(SURVEY.md §4's prescription for the rebuilt test layer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding
from ref_geotransformer_tpu.models.kpconv import KPConv, maxpool, nearest_upsample
from ref_geotransformer_tpu.models.losses import weighted_circle_loss
from ref_geotransformer_tpu.models.matching import superpoint_matching


def test_kpconv_single_kernel_point_analytic():
    """K=1 kernel point at the origin, huge sigma -> influence ~1 for every
    real neighbor: output = (sum_h f_h) @ W / count(featsum>0)."""
    n, h, cin, cout = 6, 3, 4, 5
    rng = np.random.default_rng(0)
    s_points = jnp.array(rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32))
    q_points = s_points[:2]
    s_feats = jnp.array(rng.uniform(0.1, 1.0, (n, cin)).astype(np.float32))  # positive => featsum>0
    neighbor_indices = jnp.array([[0, 1, 2], [3, 4, n]], jnp.int32)  # second row: one empty slot

    conv = KPConv(cin, cout, kernel_size=1, radius=1.0, sigma=1e6)
    variables = conv.init(jax.random.key(0), s_feats, q_points, s_points, neighbor_indices)
    # force the kernel point to the origin exactly (zero the disposition buffer)
    buffers = jax.tree_util.tree_map(jnp.zeros_like, variables["buffers"])
    w = np.asarray(variables["params"]["weights"])  # (1, cin, cout)

    out = np.asarray(
        conv.apply({"params": variables["params"], "buffers": buffers},
                   s_feats, q_points, s_points, neighbor_indices)
    )
    sf = np.asarray(s_feats)
    # row 0: neighbors 0,1,2 all real; influence 1 - d/sigma ~ 1
    expected0 = (sf[0] + sf[1] + sf[2]) @ w[0] / 3.0
    np.testing.assert_allclose(out[0], expected0, rtol=1e-4)
    # row 1: neighbors 3,4 real + 1 empty (zero feats, zero influence); count 2
    expected1 = (sf[3] + sf[4]) @ w[0] / 2.0
    np.testing.assert_allclose(out[1], expected1, rtol=1e-4)


def test_nearest_upsample_and_maxpool_sentinels():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0], [-5.0, -6.0]])
    up = np.asarray(nearest_upsample(x, jnp.array([[1, 0], [3, 3]], jnp.int32)))
    np.testing.assert_allclose(up, [[3.0, 4.0], [0.0, 0.0]])  # sentinel row 3 -> zeros

    mp = np.asarray(maxpool(x, jnp.array([[0, 1], [2, 3]], jnp.int32)))
    np.testing.assert_allclose(mp[0], [3.0, 4.0])
    # reference semantics: the zero shadow row participates in the max
    np.testing.assert_allclose(mp[1], [0.0, 0.0])


def test_structure_embedding_indices_manual_triangle():
    """3 nodes forming a right triangle: check d and angle indices by hand."""
    pts = jnp.array([[[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]]])
    masks = jnp.ones((1, 3), bool)
    mod = GeometricStructureEmbedding(8, sigma_d=0.5, sigma_a=15.0, angle_k=1)
    d_idx, a_idx = mod.get_embedding_indices(pts, masks)
    d_idx = np.asarray(d_idx)[0]
    # distances: d01 = 1, d02 = 1, d12 = sqrt(2); sigma_d = 0.5
    np.testing.assert_allclose(d_idx[0, 1], 2.0, atol=1e-5)
    np.testing.assert_allclose(d_idx[1, 2], np.sqrt(2) / 0.5, atol=1e-5)

    # node 0's nearest neighbor (k=1) is node 1 (tie d01=d02 resolved by
    # top_k order); ref vector = (1,0,0). Angle at node 0 towards node 2:
    # between (1,0,0) and (0,1,0) = 90 deg. factor = 180/(15*pi)
    a_idx = np.asarray(a_idx)[0]
    factor = 180.0 / (15.0 * np.pi)
    np.testing.assert_allclose(a_idx[0, 2, 0], (np.pi / 2) * factor, atol=1e-5)
    # angle towards itself is atan2(0, 0) = 0
    np.testing.assert_allclose(a_idx[0, 0, 0], 0.0, atol=1e-6)


def numpy_weighted_circle_loss(pos, neg, d, pm, nm, po, no, ls, pos_scales=None):
    row = (pos.sum(-1) > 0) & (neg.sum(-1) > 0)
    col = (pos.sum(-2) > 0) & (neg.sum(-2) > 0)
    pw = np.maximum(d - 1e5 * (~pos) - po, 0.0)
    if pos_scales is not None:
        pw = pw * pos_scales
    nw = np.maximum(no - (d + 1e5 * (~neg)), 0.0)

    def lse(x, axis):
        return np.log(np.sum(np.exp(x), axis=axis))

    lpr = lse(ls * (d - pm) * pw, -1)
    lpc = lse(ls * (d - pm) * pw, -2)
    lnr = lse(ls * (nm - d) * nw, -1)
    lnc = lse(ls * (nm - d) * nw, -2)
    sp = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)
    lr = sp(lpr + lnr) / ls
    lc = sp(lpc + lnc) / ls
    return 0.5 * (lr[row].mean() + lc[col].mean())


def test_weighted_circle_loss_matches_numpy_oracle():
    rng = np.random.default_rng(5)
    m, n = 7, 9
    d = rng.uniform(0, 2, (m, n)).astype(np.float32)
    pos = rng.random((m, n)) < 0.2
    neg = (~pos) & (rng.random((m, n)) < 0.5)
    scales = rng.uniform(0.5, 1.0, (m, n)).astype(np.float32)
    got = float(
        weighted_circle_loss(
            jnp.array(pos), jnp.array(neg), jnp.array(d), 0.1, 1.4, 0.1, 1.4, 24.0,
            pos_scales=jnp.array(scales),
        )
    )
    expected = numpy_weighted_circle_loss(pos, neg, d, 0.1, 1.4, 0.1, 1.4, 24.0, scales)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_superpoint_matching_dual_normalization_manual():
    """2x2 case with one invalid src node: scores renormalize over the valid
    column only and top-k returns valid pairs first."""
    ref = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    src = jnp.array([[1.0, 0.0], [0.7, 0.7]])
    ref = ref / jnp.linalg.norm(ref, axis=1, keepdims=True)
    src = src / jnp.linalg.norm(src, axis=1, keepdims=True)
    ref_masks = jnp.ones((2,), bool)
    src_masks = jnp.array([True, False])
    ri, si, scores = superpoint_matching(ref, src, ref_masks, src_masks, num_correspondences=2)
    ri, si, scores = np.asarray(ri), np.asarray(si), np.asarray(scores)
    # only src node 0 is valid: all selected pairs must use it
    assert set(si.tolist()) == {0}
    # best pair: ref 0 <-> src 0 (identical features)
    assert ri[0] == 0 and scores[0] >= scores[1] > 0


@pytest.mark.slow
def test_kpconv_bf16_coordinates_exact():
    """bf16 mode bitcasts f32 coordinates through the gather — influence
    geometry must be exact; only feature values are quantized."""
    from ref_geotransformer_tpu.models.kpconv import ResidualBlock

    n, h, cin, cout = 32, 6, 8, 16
    rng = np.random.default_rng(1)
    s_points = jnp.array(rng.uniform(-3, 3, (n, 3)).astype(np.float32))  # large coords
    q_points = s_points[:8]
    s_feats = jnp.array(rng.uniform(0.1, 1.0, (n, cin)).astype(np.float32))
    idx = jnp.array(rng.integers(0, n, (8, h)).astype(np.int32))
    masks = jnp.ones((8,), bool)
    s_masks = jnp.ones((n,), bool)

    blk32 = ResidualBlock(cin, cout, 5, radius=0.05, sigma=0.05, group_norm=4, strided=True)
    blk16 = ResidualBlock(cin, cout, 5, radius=0.05, sigma=0.05, group_norm=4, strided=True,
                          compute_dtype=jnp.bfloat16)
    variables = blk32.init(jax.random.key(0), s_feats, q_points, s_points, idx, masks, s_masks)
    out32 = np.asarray(blk32.apply(variables, s_feats, q_points, s_points, idx, masks, s_masks))
    out16 = np.asarray(blk16.apply(variables, s_feats, q_points, s_points, idx, masks, s_masks))
    # with tiny sigma vs meter-scale coords, a bf16-cast coordinate would
    # flip influence weights entirely; bit-exact coords keep outputs close
    assert np.isfinite(out16).all()
    np.testing.assert_allclose(out16, out32, rtol=0.08, atol=0.08)

    # gradients flow through the bf16 fused gather (bitcast branch is
    # constant wrt params)
    def loss(p):
        return jnp.sum(blk16.apply({"params": p, "buffers": variables["buffers"]},
                                   s_feats, q_points, s_points, idx, masks, s_masks) ** 2)

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_lgr_use_dustbin_suppresses_dustbin_lovers():
    """With use_dustbin=True the top-k/mutual selection runs on the (K+1,K+1)
    matrix: a point whose best match is the dustbin must yield no
    correspondence (reference local_global_registration.py:56-84)."""
    from ref_geotransformer_tpu.models.registration import local_to_global_registration

    p, k = 2, 4
    rng2 = np.random.default_rng(2)
    ref_pts = jnp.array(rng2.normal(size=(p, k, 3)).astype(np.float32))
    src_pts = ref_pts + 0.01
    masks = jnp.ones((p, k), bool)

    # log-scores with dustbin: row 0 of patch 0 loves the dustbin
    scores = np.full((p, k + 1, k + 1), -4.0, np.float32)
    for i in range(k):
        scores[:, i, i] = 0.0  # diagonal matches
    scores[0, 0, k] = 3.0  # ref point 0 strongly prefers the dustbin
    scores[0, 0, 0] = -1.0
    scores = jnp.array(scores)

    res_with = local_to_global_registration(
        ref_pts, src_pts, masks, masks, scores, jnp.ones((p,)),
        k=1, acceptance_radius=0.1, use_dustbin=True, correspondence_threshold=1,
        correspondence_limit=16,
    )
    res_without = local_to_global_registration(
        ref_pts, src_pts, masks, masks, scores, jnp.ones((p,)),
        k=1, acceptance_radius=0.1, use_dustbin=False, correspondence_threshold=1,
        correspondence_limit=16,
    )
    # dustbin-aware selection yields fewer correspondences (ref point 0 of
    # patch 0 is suppressed)
    assert int(np.asarray(res_with.corr_masks).sum()) < int(np.asarray(res_without.corr_masks).sum())
