"""Training-loop behavior: loss decreases when overfitting one pair, and the
iteration-based trainers + warmup-cosine schedule behave."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.engine import create_train_state, make_train_step
from ref_geotransformer_tpu.engine.iter_trainer import make_warmup_cosine_schedule
from ref_geotransformer_tpu.models import GeoTransformer
from tests.utils import tiny_config, synthetic_pair

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier


def test_overfit_single_pair_loss_decreases():
    cfg = tiny_config()
    model = GeoTransformer(cfg)
    data, _ = synthetic_pair(cfg, seed=5)
    batch = jax.tree_util.tree_map(lambda x: x[None], data)
    state, _ = create_train_state(model, data, cfg.optim, steps_per_epoch=10, rng=jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    losses = []
    rng = jax.random.key(1)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_warmup_cosine_schedule_shape():
    sched = make_warmup_cosine_schedule(1e-3, total_steps=1000, warmup_steps=100, eta_init=0.1, eta_min=0.1)
    assert float(sched(0)) == pytest.approx(1e-4, rel=1e-5)  # eta_init * lr
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-2)  # peak at end of warmup
    assert float(sched(1000)) == pytest.approx(1e-4, rel=1e-2)  # eta_min * lr
    mid = float(sched(550))
    assert 1e-4 < mid < 1e-3
