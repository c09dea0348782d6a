"""End-to-end forward smoke tests on the tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.models import GeoTransformer, overall_loss, evaluate
from tests.utils import tiny_config, synthetic_pair


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    data, gt = synthetic_pair(cfg)
    model = GeoTransformer(cfg)
    variables = model.init({"params": jax.random.key(0), "target": jax.random.key(1)}, data)
    return cfg, data, gt, model, variables


def test_forward_shapes(setup):
    cfg, data, gt, model, variables = setup
    out = model.apply(variables, data)
    p = cfg.coarse_matching.num_correspondences
    k = cfg.model.num_points_in_patch
    assert out["matching_scores"].shape == (p, k + 1, k + 1)
    assert out["estimated_transform"].shape == (4, 4)
    assert out["gt_node_overlap_map"].shape == (cfg.capacities.points[-1], cfg.capacities.points[-1])
    assert np.all(np.isfinite(np.asarray(out["matching_scores"])))
    assert np.all(np.isfinite(np.asarray(out["estimated_transform"])))


@pytest.mark.slow
def test_loss_finite_and_grads(setup):
    cfg, data, gt, model, variables = setup

    def loss_fn(params):
        out = model.apply(
            {"params": params, "buffers": variables["buffers"]},
            data,
            training=True,
            rngs={"target": jax.random.key(2)},
        )
        losses = overall_loss(out, data["transform"], cfg.coarse_loss, cfg.fine_loss, cfg.loss)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(losses["c_loss"]))
    assert np.isfinite(float(losses["f_loss"]))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least some gradient signal
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_evaluator_runs(setup):
    cfg, data, gt, model, variables = setup
    out = model.apply(variables, data)
    metrics = evaluate(out, data["transform"], cfg.eval)
    for key in ["PIR", "IR", "RRE", "RTE", "RMSE", "RR"]:
        assert np.isfinite(float(metrics[key])), key


def test_forward_jit_compiles(setup):
    cfg, data, gt, model, variables = setup
    fwd = jax.jit(lambda v, d: model.apply(v, d)["estimated_transform"])
    out1 = fwd(variables, data)
    out2 = fwd(variables, data)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
