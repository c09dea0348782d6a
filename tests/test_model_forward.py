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


def test_bf16_activation_backbone_matches_f32(setup):
    """act_dtype='bfloat16' keeps activations narrow INSIDE the backbone but
    returns f32 features at the boundary close to the f32 path (norm stats
    and accumulation stay f32, so drift is rounding-level per block)."""
    import dataclasses

    cfg, data, gt, model, variables = setup
    cfg16 = cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16", act_dtype="bfloat16")
    )
    model16 = GeoTransformer(cfg16)
    out32 = model.apply(variables, data)
    out16 = model16.apply(variables, data)  # same params: dtype is call-time only
    f32 = np.asarray(out32["ref_feats_c"])
    f16 = np.asarray(out16["ref_feats_c"])
    assert f16.dtype == np.float32  # boundary back-cast
    assert np.all(np.isfinite(f16))
    # unit-normalized coarse features: cosine alignment with the f32 path
    cos = np.sum(f32 * f16, axis=1)
    assert float(np.min(cos)) > 0.98, float(np.min(cos))
    assert np.all(np.isfinite(np.asarray(out16["estimated_transform"])))


@pytest.mark.slow
def test_bf16_activation_grads_finite(setup):
    """Gradients flow through the bf16 activation path (params stay f32)."""
    import dataclasses

    cfg, data, gt, model, variables = setup
    cfg16 = cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16", act_dtype="bfloat16")
    )
    model16 = GeoTransformer(cfg16)

    def loss_fn(params):
        out = model16.apply(
            {"params": params, "buffers": variables["buffers"]},
            data,
            training=True,
            rngs={"target": jax.random.key(2)},
        )
        losses = overall_loss(out, data["transform"], cfg.coarse_loss, cfg.fine_loss, cfg.loss)
        return losses["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert all(np.asarray(g).dtype == np.float32 for g in flat)  # f32 master grads
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0
