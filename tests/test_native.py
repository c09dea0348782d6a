"""Native C++ kernels vs the device (jnp) kernels and scipy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from ref_geotransformer_tpu.native import grid_subsample_native, radius_neighbors_native
from ref_geotransformer_tpu.ops import grid_subsample, radius_search

rng = np.random.default_rng(21)


def sort_rows(a):
    return a[np.lexsort((a[:, 0], a[:, 1], a[:, 2]))]


def test_native_grid_subsample_matches_device_kernel():
    points = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
    voxel = 0.08
    native_pts, total = grid_subsample_native(points, voxel)
    assert native_pts.shape[0] == total

    padded = jnp.array(np.pad(points, ((0, 224), (0, 0))))
    masks = jnp.array(np.arange(1024) < 800)
    dev_pts, dev_masks = grid_subsample(padded, masks, voxel, total + 16)
    dev_pts = np.asarray(dev_pts)[np.asarray(dev_masks)]

    np.testing.assert_allclose(sort_rows(native_pts), sort_rows(dev_pts), atol=1e-5)


def test_native_radius_neighbors_matches_kdtree():
    q = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    radius, limit = 0.3, 20
    out = radius_neighbors_native(q, s, radius, limit)
    tree = cKDTree(s)
    for i in range(q.shape[0]):
        idx = tree.query_ball_point(q[i], radius)
        dists = np.linalg.norm(s[idx] - q[i], axis=1)
        expected = np.array(idx)[np.argsort(dists)][:limit]
        got = out[i][out[i] < 400]
        np.testing.assert_array_equal(np.sort(got), np.sort(expected))
        got_d = np.linalg.norm(s[got] - q[i], axis=1)
        assert np.all(np.diff(got_d) >= -1e-6)


def test_native_capacity_overflow_reported():
    points = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    full, total = grid_subsample_native(points, 0.2)
    capped, total2 = grid_subsample_native(points, 0.2, capacity=total - 5)
    assert total2 == total
    assert capped.shape[0] == total - 5
