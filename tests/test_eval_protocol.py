"""Offline eval protocol tests: log/info parsers, covariance error, numpy
procrustes + RANSAC."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ref_geotransformer_tpu.data.benchmark_3dmatch import (
    compute_transform_error,
    evaluate_registration_one_scene,
    read_info_file,
    read_log_file,
    write_log_file,
    _rotation_to_quaternion,
)
from ref_geotransformer_tpu.utils.registration import (
    apply_transform_np,
    compute_inlier_ratio,
    compute_registration_error,
    ransac_registration_np,
    weighted_procrustes_np,
)

rng = np.random.default_rng(11)


def random_transform(seed=0):
    r = Rotation.random(random_state=seed).as_matrix()
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = r
    t[:3, 3] = rng.uniform(-1, 1, 3)
    return t


def test_quaternion_roundtrip():
    for seed in range(5):
        r = Rotation.random(random_state=seed)
        q = _rotation_to_quaternion(r.as_matrix())
        q_scipy = r.as_quat()  # (x, y, z, w)
        expected = np.array([q_scipy[3], q_scipy[0], q_scipy[1], q_scipy[2]])
        if expected[0] < 0:
            expected = -expected
        np.testing.assert_allclose(q, expected, atol=1e-6)


def test_procrustes_recovers_transform():
    t = random_transform(1)
    src = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    ref = apply_transform_np(src, t)
    est = weighted_procrustes_np(src, ref)
    np.testing.assert_allclose(est, t, atol=1e-4)
    rre, rte = compute_registration_error(t, est)
    assert rre < 0.01 and rte < 1e-4


def test_ransac_with_outliers():
    t = random_transform(2)
    src = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    ref = apply_transform_np(src, t)
    # corrupt 40% of correspondences
    n_bad = 80
    ref_bad = ref.copy()
    ref_bad[:n_bad] += rng.uniform(0.5, 1.0, (n_bad, 3))
    est = ransac_registration_np(ref_bad, src, distance_threshold=0.05, num_iterations=200)
    rre, rte = compute_registration_error(t, est)
    assert rre < 0.5 and rte < 0.01
    ir = compute_inlier_ratio(ref_bad, src, est, 0.05)
    assert ir > 0.55


def test_log_roundtrip_and_scene_eval(tmp_path):
    t_gt = random_transform(3)
    pairs = [
        {"test_pair": [0, 3], "num_fragments": 10, "transform": t_gt},
        {"test_pair": [1, 2], "num_fragments": 10, "transform": np.eye(4, dtype=np.float32)},  # consecutive
    ]
    gt_log = tmp_path / "gt.log"
    write_log_file(str(gt_log), pairs)
    parsed = read_log_file(str(gt_log))
    assert parsed[0]["test_pair"] == [0, 3]
    np.testing.assert_allclose(parsed[0]["transform"], t_gt, atol=1e-5)

    # info file with identity-ish covariance
    cov = np.eye(6, dtype=np.float32)
    with open(tmp_path / "gt.info", "w") as f:
        for pair in pairs:
            f.write(f"{pair['test_pair'][0]}\t{pair['test_pair'][1]}\t10\n")
            for row in cov:
                f.write("\t".join(str(x) for x in row) + "\n")
    infos = read_info_file(str(tmp_path / "gt.info"))
    assert infos[0]["covariance"].shape == (6, 6)

    # perfect estimate -> error 0, recall 1
    assert compute_transform_error(t_gt, cov, t_gt) == pytest.approx(0.0, abs=1e-8)
    write_log_file(str(tmp_path / "est.log"), [pairs[0]])
    result = evaluate_registration_one_scene(
        str(gt_log), str(tmp_path / "gt.info"), str(tmp_path / "est.log"), positive_threshold=0.2
    )
    assert result["recall"] == 1.0 and result["precision"] == 1.0
    assert result["num_gt_pairs"] == 1  # consecutive pair excluded


def test_sparse_correspondence_eval_shapes_match_dump_format():
    """The offline eval consumes compacted coarse dumps (test.py after_test_step):
    points_c (S,3), corr indices in compact space, gt map (S_ref, S_src)."""
    from ref_geotransformer_tpu.utils.registration import evaluate_sparse_correspondences

    s_ref, s_src = 11, 13
    ref_pts = rng.normal(size=(s_ref, 3))
    src_pts = rng.normal(size=(s_src, 3))
    gt_map = np.zeros((s_ref, s_src), np.float32)
    gt_map[2, 3] = 0.4
    gt_map[5, 7] = 0.2
    ref_idx = np.array([2, 5, 9])
    src_idx = np.array([3, 7, 1])
    out = evaluate_sparse_correspondences(ref_pts, src_pts, ref_idx, src_idx, gt_map)
    np.testing.assert_allclose(out["PIR"], 2 / 3)
    assert 0 <= out["hit_ratio"] <= 1


def test_save_corr_pcd(tmp_path):
    """Val-time correspondence dump (ref parity: bop_utils.py:364-441)."""
    import numpy as np

    from ref_geotransformer_tpu.utils.visualization import save_corr_pcd

    rng = np.random.default_rng(0)
    n = 20
    output = {
        "ref_points_c": rng.normal(size=(n, 3)).astype(np.float32),
        "src_points_c": rng.normal(size=(n, 3)).astype(np.float32),
        "ref_node_masks": np.ones(n, bool),
        "src_node_masks": np.ones(n, bool),
        "ref_node_corr_indices": np.array([0, 1, 2, 3]),
        "src_node_corr_indices": np.array([0, 1, 2, 3]),
        "gt_node_overlap_map": np.eye(n, dtype=np.float32) * np.concatenate(
            [np.ones(2), np.zeros(n - 2)]
        ),
    }
    ir = save_corr_pcd(output, str(tmp_path))
    assert ir == 0.5  # 2 of the 4 predicted pairs are GT
    for name in ("pcd_frame", "pcd_model", "line_gt", "line_pred", "line_inlier", "line_outlier"):
        path = tmp_path / f"{name}.ply"
        assert path.exists()
        assert path.read_text().startswith("ply")


def test_dump_registration_npz_compaction(tmp_path):
    """The shared dump helper (utils/feature_dump.py) strips padded slots and
    remaps coarse proposal indices from padded to compact space."""
    from ref_geotransformer_tpu.utils.feature_dump import dump_registration_npz

    n0, nf, nc, ncorr = 8, 6, 5, 4
    ref_mask_c = np.array([True, False, True, True, False])
    src_mask_c = np.array([True, True, False, True, True])
    data = {
        "ref_points": rng.normal(size=(n0, 3)).astype(np.float32),
        "ref_masks": np.array([True] * 7 + [False]),
        "src_points": rng.normal(size=(n0, 3)).astype(np.float32),
        "src_masks": np.ones(n0, bool),
        "transform": np.eye(4, dtype=np.float32),
    }
    output = {
        "ref_points_f": rng.normal(size=(nf, 3)).astype(np.float32),
        "src_points_f": rng.normal(size=(nf, 3)).astype(np.float32),
        "ref_masks_f": np.array([True] * 5 + [False]),
        "src_masks_f": np.ones(nf, bool),
        "ref_points_c": rng.normal(size=(nc, 3)).astype(np.float32),
        "src_points_c": rng.normal(size=(nc, 3)).astype(np.float32),
        "ref_feats_c": rng.normal(size=(nc, 4)).astype(np.float32),
        "src_feats_c": rng.normal(size=(nc, 4)).astype(np.float32),
        "ref_node_masks": ref_mask_c,
        "src_node_masks": src_mask_c,
        # proposals reference PADDED positions of valid nodes
        "ref_node_corr_indices": np.array([0, 2, 3]),
        "src_node_corr_indices": np.array([1, 3, 4]),
        "ref_corr_points": rng.normal(size=(ncorr, 3)).astype(np.float32),
        "src_corr_points": rng.normal(size=(ncorr, 3)).astype(np.float32),
        "corr_scores": np.arange(ncorr, dtype=np.float32),
        "corr_masks": np.array([True, True, False, True]),
        "gt_node_overlap_map": rng.uniform(size=(nc, nc)).astype(np.float32),
        "estimated_transform": np.eye(4, dtype=np.float32),
    }
    meta = {"scene_name": "scene", "ref_frame": 1, "src_frame": 2, "overlap": 0.7}

    path = dump_registration_npz(str(tmp_path), data, meta, output)
    assert path.endswith("scene_1_2.npz")
    dumped = np.load(path)
    assert dumped["ref_points"].shape == (7, 3)
    assert dumped["ref_points_f"].shape == (5, 3)
    assert dumped["ref_points_c"].shape == (3, 3)  # 3 valid ref nodes
    assert dumped["src_points_c"].shape == (4, 3)
    # padded positions 0,2,3 of ref -> compact 0,1,2; src 1,3,4 -> 1,2,3
    np.testing.assert_array_equal(dumped["ref_node_corr_indices"], [0, 1, 2])
    np.testing.assert_array_equal(dumped["src_node_corr_indices"], [1, 2, 3])
    assert dumped["gt_node_corr_overlaps"].shape == (3, 4)
    np.testing.assert_array_equal(
        dumped["gt_node_corr_overlaps"],
        output["gt_node_overlap_map"][np.ix_(ref_mask_c, src_mask_c)],
    )
    assert dumped["ref_corr_points"].shape == (3, 3)
    assert float(dumped["overlap"]) == 0.7


def test_read_pose_file(tmp_path):
    pose = random_transform(seed=7)
    path = tmp_path / "cloud_bin_0.info.txt"
    with open(path, "w") as f:
        f.write("cloud_bin_0\t0\t60\n")
        for row in pose.tolist():
            f.write("\t ".join(f"{x:.12f}" for x in row) + "\n")
    from ref_geotransformer_tpu.data.benchmark_3dmatch import read_pose_file

    out = read_pose_file(str(path))
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out, pose, atol=1e-9)


def test_voxel_down_sample_np_centroids():
    from ref_geotransformer_tpu.data.benchmark_3dmatch import voxel_down_sample_np

    # two clusters well inside separate voxels -> exactly their centroids
    a = np.array([[0.01, 0.01, 0.01], [0.03, 0.02, 0.01]], np.float64)
    b = np.array([[1.01, 1.02, 1.03], [1.04, 1.02, 1.01], [1.02, 1.05, 1.02]], np.float64)
    pts = np.concatenate([a, b], axis=0)
    out = voxel_down_sample_np(pts, 0.5)
    assert out.shape == (2, 3)
    got = out[np.argsort(out[:, 0])]
    np.testing.assert_allclose(got[0], a.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(got[1], b.mean(axis=0), atol=1e-6)
    assert voxel_down_sample_np(np.zeros((0, 3)), 0.1).shape == (0, 3)


def test_calibrate_ground_truth_covariance_discriminates():
    """The generated gt.info covariance must make compute_transform_error
    accept the true pose and reject a clearly-wrong one (the redwood RR
    protocol's decision rule)."""
    from ref_geotransformer_tpu.data.benchmark_3dmatch import calibrate_ground_truth

    g = np.random.default_rng(3)
    src = g.uniform(-1, 1, (4000, 3))
    gt = random_transform(seed=3)
    ref = apply_transform_np(src, gt) + g.normal(0, 0.001, (4000, 3))

    overlap, cov = calibrate_ground_truth(ref, src, gt, rng=np.random.default_rng(0))
    assert overlap > 0.5
    assert cov.shape == (6, 6)
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    assert cov[0, 0] > 0  # = number of correspondences used

    err_good = compute_transform_error(gt, cov, gt)
    assert err_good <= 1e-9

    bad = gt.copy()
    bad[:3, 3] += 0.5  # half-meter translation error
    err_bad = compute_transform_error(gt, cov, bad)
    assert err_bad > 0.2**2  # rejected at the official 0.2 m threshold


def test_calibrate_ground_truth_no_overlap():
    from ref_geotransformer_tpu.data.benchmark_3dmatch import calibrate_ground_truth

    ref = np.random.default_rng(0).uniform(0, 1, (500, 3))
    src = ref + 100.0  # disjoint
    overlap, cov = calibrate_ground_truth(ref, src, np.eye(4))
    assert overlap == 0.0
    np.testing.assert_allclose(cov, np.zeros((6, 6)))


def test_feature_tsne_colors_both_methods():
    """PCA default + the reference's sklearn t-SNE recipe (reference
    utils/visualization.py:65-77) both yield valid RGB in [0, 1]."""
    from ref_geotransformer_tpu.utils.visualization import feature_tsne_colors

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(64, 32)).astype(np.float32)
    for method in ("pca", "tsne"):
        rgb = feature_tsne_colors(feats, seed=0, method=method)
        assert rgb.shape == (64, 3), (method, rgb.shape)
        assert np.all(rgb >= 0.0) and np.all(rgb <= 1.0), method
        assert np.isfinite(rgb).all(), method
    # deterministic across calls
    a = feature_tsne_colors(feats, seed=0, method="tsne")
    b = feature_tsne_colors(feats, seed=0, method="tsne")
    np.testing.assert_array_equal(a, b)
