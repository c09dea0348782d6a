"""Cordi diffusion module tests (tiny dims, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.models.cordi import (
    Cordi,
    VarianceSchedule,
    cordi_downsample,
    get_corr_from_matrix_topk,
)


def tiny_cordi():
    return Cordi(
        ref_sample_num=8,
        src_sample_num=12,
        num_steps=10,
        time_emb_dim=32,
        n_layers=2,
        n_heads=2,
        query_dimensions=8,
        feed_forward_dimensions=32,
    )


def test_variance_schedule_matches_manual():
    vs = VarianceSchedule(10, 1e-4, 0.02)
    betas = np.concatenate([[0.0], np.linspace(1e-4, 0.02, 10)])
    alpha_bars = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(vs.alpha_bars), alpha_bars, rtol=1e-5)
    assert float(vs.sigmas_inflex[1]) == pytest.approx(0.0, abs=1e-8)  # (1-abar_0)=0
    assert np.all(np.isfinite(np.asarray(vs.sigmas_inflex)))


@pytest.mark.slow
def test_cordi_loss_and_sample():
    model = tiny_cordi()
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 8, 12))
    ctx = jax.random.normal(rng, (2, 8, 12, 16))
    variables = model.init(rng, x0, ctx)

    loss = model.apply(variables, x0, ctx, jax.random.key(1), method=Cordi.get_loss)
    assert np.isfinite(float(loss))

    # gradient flows
    g = jax.grad(
        lambda p: model.apply({"params": p}, x0, ctx, jax.random.key(1), method=Cordi.get_loss)
    )(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert total > 0

    out = model.apply(variables, x0, ctx, jax.random.key(2), method=Cordi.sample)
    assert out.shape == (2, 8, 12)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cordi_downsample_membership():
    m, n = 16, 20
    rng = np.random.default_rng(0)
    overlap = np.zeros((m, n), np.float32)
    overlap[2, 3] = 0.5
    overlap[5, 7] = 0.2
    output = {
        "ref_node_masks": jnp.ones((m,), bool),
        "src_node_masks": jnp.ones((n,), bool),
        "gt_node_overlap_map": jnp.array(overlap),
        "ref_node_corr_indices": jnp.array([2, 5, 9]),
        "src_node_corr_indices": jnp.array([3, 7, 11]),
        "ref_feats_c": jnp.array(rng.normal(size=(m, 6)).astype(np.float32)),
        "src_feats_c": jnp.array(rng.normal(size=(n, 6)).astype(np.float32)),
        "ref_points_c": jnp.array(rng.normal(size=(m, 3)).astype(np.float32)),
        "src_points_c": jnp.array(rng.normal(size=(n, 3)).astype(np.float32)),
    }
    d = cordi_downsample(jax.random.key(3), output, ref_sample_num=16, src_sample_num=20)
    gt = np.asarray(d["gt_corr_matrix"])
    # with full sampling (all nodes), membership must match exactly (up to permutation)
    assert (gt == 1.0).sum() == 2
    assert np.asarray(d["feat_matrix"]).shape == (16, 20, 12)
    init = np.asarray(d["init_corr_matrix"])
    assert (init == 1.0).sum() == 3


def test_get_corr_from_matrix_topk():
    mat = jnp.array([[0.1, 0.9, 0.2], [0.8, 0.0, 0.7]])
    ridx, sidx = get_corr_from_matrix_topk(mat, 2)
    pairs = set(zip(np.asarray(ridx).tolist(), np.asarray(sidx).tolist()))
    assert pairs == {(0, 1), (1, 0)}
