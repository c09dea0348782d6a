"""Tests against the REAL 3DMatch/KITTI metadata + benchmark ground-truth
files shipped in data/ (fragment clouds are not available in this sandbox,
so __getitem__ paths needing .pth/.npy files are not exercised)."""

import os.path as osp

import numpy as np
import pytest

ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "data")


@pytest.mark.skipif(not osp.isdir(osp.join(ROOT, "3DMatch", "metadata")), reason="no metadata")
def test_threedmatch_metadata_parses():
    from ref_geotransformer_tpu.data.datasets import ThreeDMatchPairDataset

    for subset, min_pairs in (("3DMatch", 1000), ("3DLoMatch", 1000), ("val", 100)):
        ds = ThreeDMatchPairDataset(osp.join(ROOT, "3DMatch"), subset, point_limit=None)
        assert len(ds) > min_pairs, subset
        meta = ds.metadata_list[0]
        assert {"scene_name", "frag_id0", "frag_id1", "overlap", "rotation", "translation", "pcd0", "pcd1"} <= set(
            meta.keys()
        )
        rot = np.asarray(meta["rotation"])
        assert rot.shape == (3, 3)
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-2)  # real GT rotations are only ~3e-4 orthonormal

    # overlap filtering works on real metadata
    ds_hi = ThreeDMatchPairDataset(osp.join(ROOT, "3DMatch"), "3DMatch", overlap_threshold=0.5)
    ds_all = ThreeDMatchPairDataset(osp.join(ROOT, "3DMatch"), "3DMatch")
    assert 0 < len(ds_hi) < len(ds_all)


@pytest.mark.skipif(
    not osp.isdir(osp.join(ROOT, "3DMatch", "metadata", "benchmarks")), reason="no benchmarks"
)
def test_real_gt_logs_parse_and_selfeval():
    from ref_geotransformer_tpu.data.benchmark_3dmatch import (
        evaluate_registration_one_scene,
        get_num_fragments,
        read_info_file,
        read_log_file,
        write_log_file,
    )

    scene = "7-scenes-redkitchen"
    bench_dir = osp.join(ROOT, "3DMatch", "metadata", "benchmarks", "3DMatch", scene)
    gt_logs = read_log_file(osp.join(bench_dir, "gt.log"))
    gt_infos = read_info_file(osp.join(bench_dir, "gt.info"))
    assert len(gt_logs) == len(gt_infos) > 100
    assert gt_logs[0]["num_fragments"] == get_num_fragments(scene)
    for log, info in zip(gt_logs[:20], gt_infos[:20]):
        assert log["test_pair"] == info["test_pair"]
        assert log["transform"].shape == (4, 4)
        np.testing.assert_allclose(log["transform"][3], [0, 0, 0, 1], atol=1e-6)
        assert info["covariance"].shape == (6, 6)

    # feeding the GT transforms back as estimates must give recall == 1
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        est = osp.join(tmp, "est.log")
        write_log_file(est, gt_logs)
        result = evaluate_registration_one_scene(
            osp.join(bench_dir, "gt.log"), osp.join(bench_dir, "gt.info"), est, positive_threshold=0.2
        )
        assert result["recall"] == 1.0
        assert result["precision"] == 1.0
        # real GT rotations are ~3e-4 non-orthonormal, so even self-eval RRE is ~1 deg
        assert result["mean_rre"] < 2.0 and result["mean_rte"] < 1e-4


@pytest.mark.skipif(not osp.isdir(osp.join(ROOT, "Kitti", "metadata")), reason="no metadata")
def test_kitti_metadata_parses():
    import pickle

    for subset, seqs in (("train", {0, 1, 2, 3, 4, 5}), ("val", {6, 7}), ("test", {8, 9, 10})):
        with open(osp.join(ROOT, "Kitti", "metadata", f"{subset}.pkl"), "rb") as f:
            metadata = pickle.load(f)
        assert len(metadata) > 100
        assert {int(m["seq_id"]) for m in metadata} <= seqs
        t = np.asarray(metadata[0]["transform"])
        assert t.shape == (4, 4)
