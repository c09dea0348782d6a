"""Slow-tier regression: the REAL experiment CLI stacks (trainval.py ->
test.py -> eval.py as subprocesses) run end-to-end on synthetic fixture
trees and produce complete artifacts.

This promotes tools/train_3dmatch_fixture.py / train_kitti_fixture.py from
one-off tools into asserted regressions (the reference's equivalent flow:
README.md:168-236). Tiny capacities + 1 epoch keep each stack to a few
minutes of CPU; the assertions check structure, not model quality (that is
tools/overfit_probe.py + the registration-proof artifact's job).
"""

import glob
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REQUIRED_NPZ_KEYS = {
    "ref_points", "src_points", "ref_points_c", "src_points_c",
    "ref_feats_c", "src_feats_c", "ref_node_corr_indices",
    "src_node_corr_indices", "ref_corr_points", "src_corr_points",
    "corr_scores", "gt_node_corr_overlaps",
}


def _check_common(res, eval_keys):
    assert res["ok"]
    assert osp.isdir(res["snapshot_dir"])
    assert glob.glob(osp.join(res["snapshot_dir"], "epoch-1*")), "epoch snapshot missing"
    # 3dmatch dumps under features/<benchmark>/, kitti flat under features/
    npzs = sorted(glob.glob(osp.join(res["feature_dir"], "**", "*.npz"), recursive=True))
    assert npzs, "test.py produced no feature dumps"
    data = np.load(npzs[0])
    missing = REQUIRED_NPZ_KEYS - set(data.keys())
    assert not missing, f"npz missing keys: {missing}"
    for method in ("eval_lgr", "eval_svd"):
        summary = res[method]
        assert eval_keys <= set(summary), f"{method} summary incomplete: {summary}"
        for key, value in summary.items():
            assert np.isfinite(value), f"{method}[{key}] not finite"
        assert 0.0 <= summary["RR"] <= 1.0


def test_3dmatch_fixture_cli_stack(tmp_path):
    from tools.train_3dmatch_fixture import drive

    res = drive(str(tmp_path / "tree"), epochs=1, scale=0.04)
    _check_common(res, {"RR", "IR", "FMR", "PIR"})
    assert res["val_log"], "trainval.py logged no [Val] epoch lines"


def test_kitti_fixture_cli_stack(tmp_path):
    from tools.train_kitti_fixture import drive

    res = drive(str(tmp_path / "tree"), epochs=1, scale=0.04)
    _check_common(res, {"RR", "IR", "FMR", "PIR", "PMR>0"})
