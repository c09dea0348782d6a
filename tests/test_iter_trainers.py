"""Iteration-based trainers: encoder loop and the frozen-encoder DDPM loop
(tiny dims, few iterations)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ref_geotransformer_tpu.data.loader import PairLoader
from ref_geotransformer_tpu.engine.iter_trainer import (
    IterBasedDDPMTrainer,
    IterBasedEncoderTrainer,
    make_warmup_cosine_schedule,
)
from ref_geotransformer_tpu.engine.state import TrainState, guard_nonfinite
from ref_geotransformer_tpu.engine.steps import ensure_pyramids
from ref_geotransformer_tpu.models import Cordi, GeoTransformer
from tests.test_trainer_loop import SyntheticPairs
from tests.utils import tiny_config

pytestmark = pytest.mark.slow  # multi-graph-compile e2e tier


def _make_state(model, example, cfg, rng):
    variables = model.init({"params": jax.random.key(0), "target": jax.random.key(1)}, example)
    tx = guard_nonfinite(optax.adamw(1e-4))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    ), variables


def test_iter_encoder_trainer(tmp_path):
    cfg = tiny_config()
    dataset = SyntheticPairs(cfg)
    loader = PairLoader(dataset, cfg, batch_size=1, shuffle=True, prefetch=0)
    model = GeoTransformer(cfg)
    pair0 = jax.tree_util.tree_map(lambda x: x[0], next(iter(loader)))
    state, _ = _make_state(model, ensure_pyramids(cfg, pair0), cfg, jax.random.key(0))
    sched = make_warmup_cosine_schedule(1e-4, 10, 2)

    trainer = IterBasedEncoderTrainer(
        cfg, model, state, sched, loader, loader,
        max_iteration=4, snapshot_steps=2, val_iters=1,
        snapshot_dir=str(tmp_path / "enc"), log_steps=2,
    )
    trainer.run()
    assert trainer.iteration == 4
    assert trainer.ckpt.has_snapshot()


def test_iter_ddpm_trainer(tmp_path):
    cfg = tiny_config()
    dataset = SyntheticPairs(cfg)
    loader = PairLoader(dataset, cfg, batch_size=1, shuffle=True, prefetch=0)

    encoder = GeoTransformer(cfg)
    pair0 = jax.tree_util.tree_map(lambda x: x[0], next(iter(loader)))
    _, enc_vars = _make_state(encoder, ensure_pyramids(cfg, pair0), cfg, jax.random.key(0))

    # denoiser d_model must equal the context width 2 * coarse output_dim
    cordi = Cordi(
        ref_sample_num=8, src_sample_num=12, num_steps=5, time_emb_dim=16,
        n_layers=1, n_heads=2, query_dimensions=cfg.geotransformer.output_dim,
        feed_forward_dimensions=32,
    )
    # ctx dim = 2 * coarse feature dim
    x0 = jnp.zeros((1, 8, 12))
    ctx = jnp.zeros((1, 8, 12, 2 * cfg.geotransformer.output_dim))
    cvars = cordi.init(jax.random.key(0), x0, ctx)
    tx = guard_nonfinite(optax.adamw(1e-4))
    cstate = TrainState(
        step=jnp.zeros((), jnp.int32), params=cvars["params"], buffers={},
        opt_state=tx.init(cvars["params"]), tx=tx,
    )

    trainer = IterBasedDDPMTrainer(
        cfg, encoder, enc_vars["params"], enc_vars["buffers"], cordi, cstate,
        make_warmup_cosine_schedule(1e-4, 10, 2), loader, loader,
        max_iteration=2, snapshot_steps=2, val_iters=1, ddpm_batch_size=1,
        snapshot_dir=str(tmp_path / "ddpm"), log_steps=1,
    )
    trainer.run()
    assert trainer.iteration == 2
    # loss was recorded and finite
    assert np.isfinite(trainer.summary_board.mean("loss"))
