"""Engine + data-parallel tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.engine import create_train_state, make_train_step, make_eval_step
from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
from ref_geotransformer_tpu.models import GeoTransformer
from ref_geotransformer_tpu.parallel import make_mesh, shard_batch
from tests.utils import tiny_config, synthetic_pair

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = GeoTransformer(cfg)
    pairs = [synthetic_pair(cfg, seed=s)[0] for s in range(4)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *pairs)
    state, schedule = create_train_state(model, pairs[0], cfg.optim, steps_per_epoch=10)
    return cfg, model, batch, state, schedule


def test_train_step_single_device(setup):
    cfg, model, batch, state, _ = setup
    step = make_train_step(model, cfg, donate=False)
    new_state, losses = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(losses["loss"]))
    assert int(new_state.step) == 1
    # params actually moved
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_data_parallel_matches_single(setup):
    cfg, model, batch, state, _ = setup
    assert jax.device_count() >= 4
    mesh = make_mesh(num_devices=4)
    sharded = shard_batch(batch, mesh)

    step_dp = make_train_step(model, cfg, mesh=mesh, donate=False)
    step_1 = make_train_step(model, cfg, donate=False)

    _, losses_dp = step_dp(state, sharded, jax.random.key(0))
    _, losses_1 = step_1(state, batch, jax.random.key(0))
    np.testing.assert_allclose(float(losses_dp["loss"]), float(losses_1["loss"]), rtol=2e-4)


def test_eval_step(setup):
    cfg, model, batch, state, _ = setup
    eval_step = make_eval_step(model, cfg)
    metrics = eval_step(state, batch)
    for key in ["PIR", "IR", "RRE", "RTE", "RMSE", "RR", "loss"]:
        assert np.isfinite(float(metrics[key])), key


def test_eval_step_data_parallel_matches_single(setup):
    """The full eval-metric dict (not just finiteness) agrees between the
    mesh eval and the single-device eval with identical params — the
    SPMD counterpart of the reference's metric all-reduce
    (utils/torch.py:16-34). Train a few steps first so the weights and the
    continuous metrics (loss/RRE/RTE/IR) are non-trivial."""
    cfg, model, batch, state, _ = setup
    mesh = make_mesh(num_devices=4)
    sharded = shard_batch(batch, mesh)

    step_dp = make_train_step(model, cfg, mesh=mesh, donate=False)
    for i in range(3):
        state, _ = step_dp(state, sharded, jax.random.key(i))

    metrics_dp = jax.device_get(make_eval_step(model, cfg, mesh=mesh)(state, sharded))
    metrics_1 = jax.device_get(make_eval_step(model, cfg)(jax.device_get(state), batch))
    assert set(metrics_dp) == set(metrics_1)
    for key in sorted(metrics_dp):
        a, b = float(metrics_dp[key]), float(metrics_1[key])
        assert np.isfinite(a) and np.isfinite(b), key
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5, err_msg=key)


def test_data_parallel_convergence_trajectory(setup, tmp_path):
    """20-step DP-vs-single-device loss-trajectory equality, with a
    checkpoint save/restore in the middle of the DP run.

    The reference can only assert DDP correctness indirectly (per-GPU loss
    logging, geotransformer/utils/torch.py all_reduce_tensors); here SPMD
    lets us demand bitwise-level agreement: the same global batch sharded
    over 4 devices must produce the same optimizer trajectory as one device.
    """
    cfg, model, batch, state0, _ = setup
    assert jax.device_count() >= 4
    mesh = make_mesh(num_devices=4)

    step_dp = make_train_step(model, cfg, mesh=mesh, donate=False)
    step_1 = make_train_step(model, cfg, donate=False)

    n_steps, ckpt_at = 20, 10
    ckpt = CheckpointManager(str(tmp_path / "snap_dp"))

    traj_1, traj_dp = [], []
    state = state0
    for i in range(n_steps):
        state, losses = step_1(state, batch, jax.random.key(i))
        traj_1.append(float(losses["loss"]))

    state = state0
    for i in range(n_steps):
        sharded = shard_batch(batch, mesh)
        state, losses = step_dp(state, sharded, jax.random.key(i))
        traj_dp.append(float(losses["loss"]))
        if i + 1 == ckpt_at:
            # snapshot mid-run, clobber the live state, restore, continue
            ckpt.save_snapshot(state, epoch=0, iteration=i + 1)
            wrecked = state.replace(
                params=jax.tree_util.tree_map(lambda x: x * 0.0, state.params)
            )
            state, _, it = ckpt.load_snapshot(wrecked)
            assert it == ckpt_at

    np.testing.assert_allclose(np.array(traj_dp), np.array(traj_1), rtol=5e-3, atol=1e-5)
    # the run actually trained: loss moved from its starting value
    assert abs(traj_1[-1] - traj_1[0]) > 1e-4


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, batch, state, _ = setup
    ckpt = CheckpointManager(str(tmp_path / "snapshots"))
    ckpt.save_snapshot(state, epoch=3, iteration=42)
    assert ckpt.has_snapshot()

    # perturb then restore
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params), step=state.step + 7
    )
    restored, epoch, iteration = ckpt.load_snapshot(perturbed)
    assert epoch == 3 and iteration == 42
    chex_ok = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)), restored.params, state.params
    )
    assert int(restored.step) == int(state.step)

    ckpt.save_epoch("epoch-3", state.params, state.buffers)
    loaded = ckpt.load_model("epoch-3", state.params, state.buffers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)), loaded["params"], state.params
    )
