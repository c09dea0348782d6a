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


def test_linemod_twophase_cli_stack(tmp_path):
    """The full two-phase LineMod flow (trainval_encoder.py ->
    train_cordi.py --encoder_snapshot) through the real CLIs on a synthetic
    BOP tree. Structure assertions only at these iteration counts; the
    LEARNING evidence is the chip artifact TWOPHASE_r04.json (3k+4k iters
    with REF_GT_WARMUP=300: cordi loss 1.04->0.07, DDPM val PIR@32
    0.281->0.391 over training — the Cordi value proposition of reference
    modules/cordi/cordi.py:139-160 asserted on silicon)."""
    from tools.train_linemod_twophase import drive

    # snapshot_every=3 -> the encoder handoff snapshot iter-6 exists and the
    # expensive DDPM val runs exactly once; ddpm_steps=8 shrinks the reverse
    # sampler (100 steps of an 8-layer d512 transformer is minutes/sample
    # on CPU)
    res = drive(encoder_iters=6, cordi_iters=3, snapshot_every=3, ddpm_steps=8,
                data_root=str(tmp_path / "data"), out_root=str(tmp_path / "out"))
    for key in ("encoder_loss_first", "encoder_loss_last",
                "cordi_loss_first", "cordi_loss_last"):
        assert np.isfinite(res[key]), f"{key} not finite: {res[key]}"
    missing = {"PIR", "PIR_0.5", "PIR_0.25", "IIR"} - set(res["ddpm_val"])
    assert not missing, f"DDPM val metrics missing: {missing} in {res['ddpm_val']}"
    for key, value in res["ddpm_val"].items():
        assert np.isfinite(value), f"ddpm_val[{key}] not finite"
