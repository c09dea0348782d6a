"""The driver contract: bench.py prints exactly ONE JSON line with metric /
value / unit / vs_baseline (run at smoke capacities on the CPU backend)."""

import json
import os
import os.path as osp
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, osp.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=580,
        cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected one line, got: {lines}"
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0
    assert payload["unit"] == "pairs/sec/chip"


def test_bench_train_mode_prints_one_json_line():
    """BENCH_TRAIN=1: the train-throughput mode (fwd+bwd+update) keeps the
    one-JSON-line contract and reports a finite loss."""
    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    env["BENCH_TRAIN"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, osp.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=580,
        cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected one line, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "3dmatch_train_pairs_per_sec"
    assert payload["value"] > 0
    assert payload["loss_finite"] is True
