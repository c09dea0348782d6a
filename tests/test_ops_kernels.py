"""Oracle tests for the static-shape neighborhood kernels: voxel-grid
subsample vs a numpy hash-map oracle (mirroring the reference C++ semantics,
grid_subsampling_cpu.cpp:3-48) and radius search vs scipy cKDTree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from ref_geotransformer_tpu.ops import grid_subsample, radius_search, knn_search
from ref_geotransformer_tpu.ops.subsample import count_voxels

rng = np.random.default_rng(7)


def numpy_grid_subsample(points, voxel_size):
    """Oracle with the exact reference semantics: centroid per occupied voxel,
    origin at floor(min/voxel)*voxel."""
    origin = np.floor(points.min(0) / voxel_size) * voxel_size
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    voxels = {}
    for p, c in zip(points, coords):
        key = tuple(c)
        if key not in voxels:
            voxels[key] = []
        voxels[key].append(p)
    return np.array([np.mean(v, axis=0) for v in voxels.values()])


def pad_cloud(points, capacity):
    n = points.shape[0]
    padded = np.zeros((capacity, 3), np.float32)
    padded[:n] = points
    masks = np.zeros(capacity, bool)
    masks[:n] = True
    return jnp.array(padded), jnp.array(masks)


@pytest.mark.parametrize("n,voxel", [(500, 0.1), (1000, 0.05), (64, 0.3)])
def test_grid_subsample_matches_oracle(n, voxel):
    points = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    expected = numpy_grid_subsample(points, voxel)

    padded, masks = pad_cloud(points, n + 37)
    cap = expected.shape[0] + 11
    s_points, s_masks = jax.jit(grid_subsample, static_argnums=(2, 3))(padded, masks, voxel, cap)
    s_points = np.asarray(s_points)[np.asarray(s_masks)]

    assert s_points.shape[0] == expected.shape[0]
    # order-insensitive comparison: sort both lexicographically
    def sort_rows(a):
        return a[np.lexsort((a[:, 0], a[:, 1], a[:, 2]))]

    np.testing.assert_allclose(sort_rows(s_points), sort_rows(expected), atol=1e-5)


def test_grid_subsample_capacity_overflow_drops_tail():
    points = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    padded, masks = pad_cloud(points, 256)
    full = numpy_grid_subsample(points, 0.2)
    cap = full.shape[0] - 3
    s_points, s_masks = grid_subsample(padded, masks, 0.2, cap)
    assert int(np.asarray(s_masks).sum()) == cap


def test_count_voxels():
    points = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    padded, masks = pad_cloud(points, 384)
    expected = numpy_grid_subsample(points, 0.15).shape[0]
    assert int(count_voxels(padded, masks, 0.15)) == expected


def test_radius_search_matches_kdtree():
    q = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    radius, limit = 0.25, 16

    qp, qm = pad_cloud(q, 256)
    sp, sm = pad_cloud(s, 320)
    out = np.asarray(
        jax.jit(radius_search, static_argnums=(4, 5))(qp, sp, qm, sm, radius, limit)
    )

    tree = cKDTree(s)
    for i in range(q.shape[0]):
        idx = tree.query_ball_point(q[i], radius)
        dists = np.linalg.norm(s[idx] - q[i], axis=1)
        expected = np.array(idx)[np.argsort(dists)][:limit]
        got = out[i][out[i] < 320]
        assert len(got) == len(expected)
        # sorted by distance: same set AND same order up to distance ties
        np.testing.assert_array_equal(
            np.sort(got), np.sort(expected)
        )
        got_d = np.linalg.norm(s[got] - q[i], axis=1)
        assert np.all(np.diff(got_d) >= -1e-6)

    # invalid query rows are all-sentinel
    assert np.all(out[200:] == 320)


def test_radius_search_sentinel_for_invalid_support():
    q = np.zeros((4, 3), np.float32)
    s = np.zeros((8, 3), np.float32)
    qp, qm = pad_cloud(q, 4)
    sp, sm_np = pad_cloud(s, 8)
    sm = jnp.array(np.array([True] * 3 + [False] * 5))  # only 3 valid supports
    out = np.asarray(radius_search(qp, sp, qm, sm, 0.5, 6))
    for row in out:
        assert set(row[row < 8]) <= {0, 1, 2}
        assert np.sum(row < 8) == 3


def test_knn_search():
    q = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(80, 3)).astype(np.float32)
    qp, qm = pad_cloud(q, 64)
    sp, sm = pad_cloud(s, 96)
    idx, sq = knn_search(qp, sp, qm, sm, 5)
    idx, sq = np.asarray(idx), np.asarray(sq)
    tree = cKDTree(s)
    d, expected = tree.query(q, k=5)
    np.testing.assert_array_equal(idx[:50], expected)
    np.testing.assert_allclose(np.sqrt(sq[:50]), d, atol=1e-4)


def test_bucketed_matches_brute_large():
    from ref_geotransformer_tpu.ops.neighbors import radius_search_brute, radius_search_bucketed

    q = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, (4000, 3)).astype(np.float32)
    qp, qm = pad_cloud(q, 3072)
    sp, sm = pad_cloud(s, 4096)
    radius, limit = 0.35, 24
    brute = np.asarray(radius_search_brute(qp, sp, qm, sm, radius, limit, 512))
    bucket = np.asarray(radius_search_bucketed(qp, sp, qm, sm, radius, limit, 512))
    # identical neighbor sets and order (both distance-sorted, exact)
    mismatch = (brute != bucket).mean()
    assert mismatch < 1e-6, f"bucketed differs from brute on {mismatch:.2%} of slots"


def test_bucketed_cell_overflow_degrades_gracefully():
    from ref_geotransformer_tpu.ops.neighbors import radius_search_bucketed

    # 500 points inside ONE cell: candidates are capped by cell_capacity
    s = rng.uniform(0, 0.09, (500, 3)).astype(np.float32)
    q = s[:10]
    qp, qm = pad_cloud(q, 16)
    sp, sm = pad_cloud(s, 512)
    out = np.asarray(radius_search_bucketed(qp, sp, qm, sm, 0.1, 8, 16, cell_capacity=64))
    valid_counts = (out[:10] < 512).sum(1)
    assert np.all(valid_counts == 8)  # still fills every slot from the capped candidates
