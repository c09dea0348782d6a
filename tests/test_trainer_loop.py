"""End-to-end engine loop: EpochBasedTrainer over synthetic pairs (train +
val + snapshot + resume), SingleTester over the snapshot."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.data.loader import PairLoader
from ref_geotransformer_tpu.engine import EpochBasedTrainer, SingleTester, create_train_state
from ref_geotransformer_tpu.engine.steps import ensure_pyramids
from ref_geotransformer_tpu.models import GeoTransformer
from tests.utils import tiny_config, synthetic_pair

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier


class SyntheticPairs:
    """Dataset-shaped wrapper over synthetic_pair raw clouds."""

    def __init__(self, cfg, n=4):
        self.items = []
        rng = np.random.default_rng(0)
        for i in range(n):
            base = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
            base[:, 2] = 0.2 * np.sin(3 * base[:, 0])
            t = np.eye(4, dtype=np.float32)
            self.items.append(
                {
                    "scene_name": f"s{i}",
                    "ref_frame": i,
                    "src_frame": i,
                    "overlap": 1.0,
                    "ref_points": base + rng.normal(0, 0.002, base.shape).astype(np.float32),
                    "src_points": base + rng.normal(0, 0.002, base.shape).astype(np.float32),
                    "transform": t,
                }
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_trainer_epoch_loop_and_resume(tmp_path):
    cfg = tiny_config().replace(optim=tiny_config().optim.__class__(max_epoch=2))
    dataset = SyntheticPairs(cfg)
    train_loader = PairLoader(dataset, cfg, batch_size=2, shuffle=True, drop_last=True, prefetch=0)
    val_loader = PairLoader(dataset, cfg, batch_size=2, prefetch=0)

    model = GeoTransformer(cfg)
    example = next(iter(train_loader))
    pair0 = jax.tree_util.tree_map(lambda x: x[0], example)
    state, schedule = create_train_state(model, ensure_pyramids(cfg, pair0), cfg.optim, steps_per_epoch=2)

    snap_dir = str(tmp_path / "snaps")
    trainer = EpochBasedTrainer(
        cfg, model, state, schedule, train_loader, val_loader,
        snapshot_dir=snap_dir, log_steps=1, event_dir=str(tmp_path / "events"),
    )
    trainer.run()
    assert trainer.epoch == 2
    assert trainer.ckpt.has_snapshot()
    assert sorted(trainer.ckpt.list_epochs()) == ["epoch-1", "epoch-2"]
    assert (tmp_path / "events" / "scalars.jsonl").exists()

    # resume continues from epoch 2 (no more epochs to run)
    state2, _ = create_train_state(model, ensure_pyramids(cfg, pair0), cfg.optim, steps_per_epoch=2)
    trainer2 = EpochBasedTrainer(
        cfg, model, state2, schedule, train_loader, val_loader, snapshot_dir=snap_dir, log_steps=1
    )
    trainer2.run(resume=True)
    assert trainer2.epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]),
    )

    # tester over the snapshot
    tester = SingleTester.from_snapshot(
        cfg, model, state2, snap_dir, "epoch-2", train_loader.iter_single()
    )
    summary = tester.run()
    assert np.isfinite(summary["RRE"])
