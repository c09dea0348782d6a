"""Brute-force oracle tests for point-to-node partition and metrics."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from ref_geotransformer_tpu.ops import (
    point_to_node_partition,
    get_point_to_node_indices,
    knn_partition,
    ball_query_partition,
    isotropic_transform_error,
    registration_rmse,
    inlier_ratio,
    overlap_ratio,
    modified_chamfer_distance,
    masked_gather,
)

rng = np.random.default_rng(3)


def make_pad(arr, capacity):
    n = arr.shape[0]
    out = np.zeros((capacity,) + arr.shape[1:], arr.dtype)
    out[:n] = arr
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.array(out), jnp.array(mask)


def test_point_to_node_partition_oracle():
    points = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
    nodes = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    K = 30

    p, pm = make_pad(points, 128)
    nd, ndm = make_pad(nodes, 16)

    point_to_node, node_masks, knn_idx, knn_masks = point_to_node_partition(p, nd, K, pm, ndm)
    point_to_node = np.asarray(point_to_node)
    node_masks = np.asarray(node_masks)
    knn_idx = np.asarray(knn_idx)
    knn_masks = np.asarray(knn_masks)

    # oracle assignment
    d = np.linalg.norm(points[:, None] - nodes[None], axis=-1)
    expected_assign = d.argmin(1)
    np.testing.assert_array_equal(point_to_node[:120], expected_assign)
    assert np.all(point_to_node[120:] == 16)

    # node occupancy
    for m in range(10):
        assert node_masks[m] == np.any(expected_assign == m)
    assert not node_masks[10:].any()

    # patches contain exactly the owned points (up to K), nearest-first
    for m in range(10):
        owned = np.where(expected_assign == m)[0]
        owned_sorted = owned[np.argsort(d[owned, m])][:K]
        got = knn_idx[m][knn_masks[m]]
        np.testing.assert_array_equal(got, owned_sorted)
        assert np.all(knn_idx[m][~knn_masks[m]] == 128)


def test_get_point_to_node_counts():
    points = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    nodes = rng.uniform(-1, 1, (6, 3)).astype(np.float32)
    p, pm = make_pad(points, 64)
    nd, ndm = make_pad(nodes, 8)
    idx, sizes = get_point_to_node_indices(p, nd, pm, ndm, return_counts=True)
    d = np.linalg.norm(points[:, None] - nodes[None], axis=-1)
    expected = d.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx)[:50], expected)
    np.testing.assert_array_equal(np.asarray(sizes)[:6], np.bincount(expected, minlength=6))


def test_knn_and_ball_query():
    points = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
    nodes = rng.uniform(-1, 1, (7, 3)).astype(np.float32)
    p, pm = make_pad(points, 96)
    nd, ndm = make_pad(nodes, 8)
    idx, masks = knn_partition(p, nd, 5, pm, ndm)
    d = np.linalg.norm(nodes[:, None] - points[None], axis=-1)
    expected = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx)[:7], expected)

    r = 0.4
    bidx, bmask = ball_query_partition(p, nd, r, 5, pm, ndm)
    bidx = np.asarray(bidx)
    for m in range(7):
        got = bidx[m][bidx[m] < 96]
        exp = expected[m][d[m, expected[m]] < r]
        np.testing.assert_array_equal(got, exp)


def test_masked_gather_sentinel():
    data = jnp.array(rng.normal(size=(5, 4)).astype(np.float32))
    idx = jnp.array([0, 4, 5, 2])
    out = np.asarray(masked_gather(data, idx))
    np.testing.assert_allclose(out[0], np.asarray(data)[0])
    np.testing.assert_allclose(out[2], 0.0)


def test_isotropic_error():
    rot = Rotation.from_euler("z", 30, degrees=True).as_matrix().astype(np.float32)
    gt = np.eye(4, dtype=np.float32)
    est = np.eye(4, dtype=np.float32)
    est[:3, :3] = rot
    est[:3, 3] = [1, 2, 2]
    rre, rte = isotropic_transform_error(jnp.array(gt), jnp.array(est))
    np.testing.assert_allclose(float(rre), 30.0, atol=1e-3)
    np.testing.assert_allclose(float(rte), 3.0, atol=1e-5)


def test_registration_metrics_perfect_alignment():
    src = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    rot = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = rot
    t[:3, 3] = [0.5, -0.2, 0.1]
    sp, sm = make_pad(src, 48)
    rmse = registration_rmse(sp, jnp.array(t), jnp.array(t), sm)
    assert float(rmse) < 1e-5

    ref = np.asarray(jnp.array(src) @ jnp.array(rot).T + jnp.array(t[:3, 3]))
    rp, rm = make_pad(ref.astype(np.float32), 48)
    ir = inlier_ratio(rp, sp, jnp.array(t), 0.1, rm)
    np.testing.assert_allclose(float(ir), 1.0)
    ov = overlap_ratio(rp, sp, jnp.array(t), 0.1, rm, sm)
    np.testing.assert_allclose(float(ov), 1.0)


def test_chamfer_zero_when_identical():
    raw = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    rawp, rawm = make_pad(raw, 64)
    d = modified_chamfer_distance(rawp, rawp, rawp, jnp.array(t), jnp.array(t), rawm, rawm, rawm)
    assert float(d) < 1e-6
