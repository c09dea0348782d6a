"""Slow-tier loss->registration regression: optimizing the shipped training
loss on a tiny fixed pair set must drive eval RR to 1 within a few dozen
steps (the reference's own correctness-probe pattern, modelnet
dataset.py:64,92-98 `overfitting_index`).

The committed full-scale chip trajectory lives in OVERFIT_PROBE_r03.json
(RR 0->1 by step 80 at scale 0.25); the real-CLI-stack equivalent in
TRAINPROOF_r03.json; the 4-pair CPU trajectory this test pins is
OVERFIT_PROBE4_r04.json (RR monotone 0->1 by step 20, held through 40).
This test runs the same causal chain at CPU-runnable scale so a regression
anywhere in loss/matching/registration fails CI.

4 pairs + an endpoint-window assertion (not the peak): the 2-pair probe's
RR flickered 1.0<->0.5 between evals (each pair is 0.5 of the metric), so
asserting the max was statistically thin. With 4 pairs the committed
trajectory holds RR=1.0 for every eval from step 20 on; the mean over the
last 3 evals tolerates one pair dropping out without passing a broken run.
"""

import pytest

pytestmark = pytest.mark.slow


def test_overfit_probe_registration_rises():
    from tools.overfit_probe import run_probe

    res = run_probe(steps=30, scale=0.06, pairs=4, log_every=5, lr=1e-4)
    traj = res["trajectory"]
    assert traj, "probe produced no trajectory"
    assert all(row["skipped_steps"] <= 0 for row in traj), (
        "apply_if_finite skipped steps (non-finite grads): "
        f"{[row['skipped_steps'] for row in traj]}"
    )
    # training loss strictly improves...
    if len(traj) > 2:
        assert traj[-1]["train_loss"] < traj[1]["train_loss"], f"trajectory: {traj}"
    # ...and registration is achieved AND SUSTAINED: mean RR over the last 3
    # evals (steps 20/25/30 at log_every=5) must be >=0.9 — a single-pair
    # dropout (3.67/4 -> 0.917) passes, a flicker to 0.5 fails. Committed
    # trajectory: 1.0/1.0/1.0 (OVERFIT_PROBE4_r04.json).
    window = traj[-3:]
    mean_rr = sum(row["RR"] for row in window) / len(window)
    best_rmse = min(row["RMSE"] for row in traj)
    assert mean_rr >= 0.9, (
        f"RR endpoint window mean {mean_rr} < 0.9: {[(r['step'], r['RR']) for r in traj]}"
    )
    assert best_rmse < 0.1, f"RMSE never dropped (best {best_rmse}); trajectory: {traj}"
