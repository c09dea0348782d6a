"""Slow-tier loss->registration regression: optimizing the shipped training
loss on a tiny fixed pair set must drive eval RR to 1 within a few dozen
steps (the reference's own correctness-probe pattern, modelnet
dataset.py:64,92-98 `overfitting_index`).

The committed full-scale chip trajectory lives in OVERFIT_PROBE_r03.json
(RR 0->1 by step 80 at scale 0.25); the real-CLI-stack equivalent in
TRAINPROOF_r03.json. This test pins the same causal chain at CPU-runnable
scale so a regression anywhere in loss/matching/registration fails CI.
"""

import pytest

pytestmark = pytest.mark.slow


def test_overfit_probe_registration_rises():
    from tools.overfit_probe import run_probe

    res = run_probe(steps=30, scale=0.06, pairs=2, log_every=10)
    traj = res["trajectory"]
    assert traj, "probe produced no trajectory"
    assert all(row["skipped_steps"] <= 0 for row in traj), (
        "apply_if_finite skipped steps (non-finite grads): "
        f"{[row['skipped_steps'] for row in traj]}"
    )
    # training loss strictly improves...
    if len(traj) > 2:
        assert traj[-1]["train_loss"] < traj[1]["train_loss"], f"trajectory: {traj}"
    # ...and registration is actually achieved during the probe (at random
    # init RR=0 / RMSE>1; a broken loss->matching->procrustes chain never
    # registers). RR on 2 pairs flickers 1.0<->0.5 before settling (see
    # OVERFIT_PROBE_r03.json), so assert the peak, not the endpoint.
    best_rr = max(row["RR"] for row in traj)
    best_rmse = min(row["RMSE"] for row in traj)
    assert best_rr >= 0.9, f"RR never rose (best {best_rr}); trajectory: {traj}"
    assert best_rmse < 0.1, f"RMSE never dropped (best {best_rmse}); trajectory: {traj}"
