"""End-to-end offline eval: synthetic .npz dumps in test.py's format +
synthetic gt.log/gt.info -> eval_one_epoch -> sane metrics. Exercises the
compacted-dump contract and the scene-level RR protocol together."""

import os.path as osp
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

EXP_DIR = osp.join(
    osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments", "geotransformer_3dmatch_stage4"
)
sys.path.insert(0, EXP_DIR)


def _random_transform(seed):
    rng = np.random.default_rng(seed)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rotation.random(random_state=seed).as_matrix()
    t[:3, 3] = rng.uniform(-1, 1, 3)
    return t


def test_eval_one_epoch_on_synthetic_dumps(tmp_path, monkeypatch):
    import eval as eval_mod  # experiments/geotransformer_3dmatch_stage4/eval.py

    from ref_geotransformer_tpu.data.benchmark_3dmatch import write_log_file
    from types import SimpleNamespace

    scene = "7-scenes-redkitchen"
    num_fragments = 60
    feature_dir = tmp_path / "features"
    feature_dir.mkdir()
    bench_dir = tmp_path / "metadata" / "benchmarks" / "3DMatch" / scene
    bench_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    gt_pairs = []
    covariance = np.eye(6, dtype=np.float32)
    info_lines = []
    for i, (a, b) in enumerate([(0, 3), (1, 5), (2, 8)]):
        transform = _random_transform(i)
        gt_pairs.append({"test_pair": [a, b], "num_fragments": num_fragments, "transform": transform})
        info_lines.append((a, b))

        # perfect correspondences: est transform == gt
        n_c, n_corr = 40, 120
        src_corr = rng.uniform(-1, 1, (n_corr, 3)).astype(np.float32)
        ref_corr = src_corr @ transform[:3, :3].T + transform[:3, 3]
        gt_map = np.zeros((n_c, n_c), np.float32)
        idx = rng.integers(0, n_c, 30)
        jdx = rng.integers(0, n_c, 30)
        gt_map[idx, jdx] = rng.uniform(0.2, 0.9, 30)
        sel = rng.integers(0, 30, 25)  # proposals: subset of GT pairs (PIR-correct)
        np.savez_compressed(
            feature_dir / f"{scene}_{a}_{b}.npz",
            ref_points=rng.normal(size=(500, 3)).astype(np.float32),
            src_points=rng.normal(size=(500, 3)).astype(np.float32),
            ref_points_f=rng.normal(size=(200, 3)).astype(np.float32),
            src_points_f=rng.normal(size=(200, 3)).astype(np.float32),
            ref_points_c=rng.normal(size=(n_c, 3)).astype(np.float32),
            src_points_c=rng.normal(size=(n_c, 3)).astype(np.float32),
            ref_feats_c=rng.normal(size=(n_c, 8)).astype(np.float32),
            src_feats_c=rng.normal(size=(n_c, 8)).astype(np.float32),
            ref_node_corr_indices=idx[sel],
            src_node_corr_indices=jdx[sel],
            ref_corr_points=ref_corr,
            src_corr_points=src_corr,
            corr_scores=np.ones(n_corr, np.float32),
            gt_node_corr_overlaps=gt_map,
            estimated_transform=transform,
            transform=transform,
            overlap=0.5,
        )

    write_log_file(str(bench_dir / "gt.log"), gt_pairs)
    with open(bench_dir / "gt.info", "w") as f:
        for a, b in info_lines:
            f.write(f"{a}\t{b}\t{num_fragments}\n")
            for row in covariance:
                f.write("\t".join(str(x) for x in row) + "\n")

    monkeypatch.setattr(eval_mod, "FEATURE_DIR", str(tmp_path / "unused"))
    monkeypatch.setattr(eval_mod, "DATASET_ROOT", str(tmp_path))
    monkeypatch.setattr(eval_mod, "REGISTRATION_DIR", str(tmp_path / "registration"))

    from config import make_cfg

    cfg = make_cfg(demo=True)
    args = SimpleNamespace(benchmark="3DMatch", feature_dir=str(feature_dir), method="lgr",
                           num_corr=None, verbose=False)
    summary = eval_mod.eval_one_epoch(args, cfg)

    # perfect transforms + GT-subset proposals + exact correspondences
    assert summary["PIR"] == pytest.approx(1.0)
    assert summary["IR"] == pytest.approx(1.0)
    assert summary["FMR"] == pytest.approx(1.0)
    assert summary["RR"] == pytest.approx(1.0)
    # reference protocol superset (eval.py:241-344): PMR buckets, overlap,
    # scene-wise breakdown, medians, FMR std over scenes
    for bucket in ("PMR>0", "PMR>=0.1", "PMR>=0.3", "PMR>=0.5"):
        assert summary[bucket] == pytest.approx(1.0)
    assert summary["OV"] == pytest.approx(1.0)
    assert summary["median_rre"] == pytest.approx(0.0, abs=1e-3)
    assert summary["median_rte"] == pytest.approx(0.0, abs=1e-3)
    assert summary["FMR_std"] == pytest.approx(0.0)
    (scene_abbr,) = summary["scenes"].keys()
    assert summary["scenes"][scene_abbr]["RR"] == pytest.approx(1.0)

    # svd method also recovers the transform from perfect correspondences
    args_svd = SimpleNamespace(benchmark="3DMatch", feature_dir=str(feature_dir), method="svd",
                               num_corr=None, verbose=False)
    summary_svd = eval_mod.eval_one_epoch(args_svd, cfg)
    assert summary_svd["RR"] == pytest.approx(1.0)


def test_kitti_eval_on_synthetic_dumps(tmp_path):
    """KITTI offline eval (reference kitti eval.py:35-180 parity): perfect
    synthetic dumps -> PIR/PMR buckets/FMR/IR/OV/RR all 1.0, RRE/RTE ~0."""
    import importlib
    from types import SimpleNamespace

    kitti_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments", "geotransformer_kitti_stage5"
    )
    sys.path.insert(0, kitti_dir)
    for mod in ("config", "eval"):
        sys.modules.pop(mod, None)
    try:
        kitti_eval = importlib.import_module("eval")
        from config import make_cfg as kitti_make_cfg

        cfg = kitti_make_cfg()
        feature_dir = tmp_path / "features"
        feature_dir.mkdir()
        rng = np.random.default_rng(1)
        for i, (a, b) in enumerate([(0, 5), (10, 16)]):
            transform = _random_transform(10 + i)
            n_c, n_corr = 30, 90
            src_corr = rng.uniform(-20, 20, (n_corr, 3)).astype(np.float32)
            ref_corr = src_corr @ transform[:3, :3].T + transform[:3, 3]
            gt_map = np.zeros((n_c, n_c), np.float32)
            idx = rng.integers(0, n_c, 20)
            jdx = rng.integers(0, n_c, 20)
            gt_map[idx, jdx] = rng.uniform(0.2, 0.9, 20)
            sel = rng.integers(0, 20, 15)
            np.savez_compressed(
                feature_dir / f"seq08_{a}_{b}.npz",
                ref_points_c=rng.normal(size=(n_c, 3)).astype(np.float32),
                src_points_c=rng.normal(size=(n_c, 3)).astype(np.float32),
                ref_node_corr_indices=idx[sel],
                src_node_corr_indices=jdx[sel],
                ref_corr_points=ref_corr,
                src_corr_points=src_corr,
                corr_scores=np.ones(n_corr, np.float32),
                gt_node_corr_overlaps=gt_map,
                estimated_transform=transform,
                transform=transform,
            )

        args = SimpleNamespace(method="lgr", num_corr=None, feature_dir=str(feature_dir), verbose=False)
        summary = kitti_eval.eval_one_epoch(args, cfg)
        for key in ("PIR", "PMR>0", "PMR>=0.5", "FMR", "IR", "OV", "RR"):
            assert summary[key] == pytest.approx(1.0), key
        assert summary["RRE"] == pytest.approx(0.0, abs=1e-3)
        assert summary["RTE"] == pytest.approx(0.0, abs=1e-3)

        args_svd = SimpleNamespace(method="svd", num_corr=None, feature_dir=str(feature_dir), verbose=False)
        assert kitti_eval.eval_one_epoch(args_svd, cfg)["RR"] == pytest.approx(1.0)
    finally:
        sys.path.remove(kitti_dir)
        for mod in ("config", "eval"):
            sys.modules.pop(mod, None)
