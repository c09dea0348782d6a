"""Sinkhorn OT semantics: marginal constraints, dustbin absorption, mask
handling (vs the SuperGlue-style formulation)."""

import numpy as np
import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport


def make(scores_shape=(2, 6, 5), iters=200, seed=0):
    rng = np.random.default_rng(seed)
    scores = jnp.array(rng.normal(size=scores_shape).astype(np.float32))
    module = LearnableLogOptimalTransport(iters)
    variables = module.init(jax.random.key(0), scores)
    return module, variables, scores


def test_marginals_full_masks():
    module, variables, scores = make()
    out = np.asarray(module.apply(variables, scores))  # (B, M+1, N+1) log
    p = np.exp(out)
    b, m1, n1 = p.shape
    m, n = m1 - 1, n1 - 1
    # After the final +log(M+N) renormalization (learnable_sinkhorn.py:63-64),
    # every real row/col sums to 1; the dustbin row absorbs N, the dustbin
    # col absorbs M.
    np.testing.assert_allclose(p[:, :m, :].sum(-1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(p[:, :, :n].sum(1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(p[:, m, :].sum(-1), float(n), rtol=1e-3)
    np.testing.assert_allclose(p[:, :, n].sum(1), float(m), rtol=1e-3)


def test_masked_rows_get_no_mass():
    module, variables, scores = make()
    row_masks = jnp.array([[True] * 4 + [False] * 2, [True] * 6])
    col_masks = jnp.array([[True] * 5, [True] * 3 + [False] * 2])
    out = np.asarray(module.apply(variables, scores, row_masks, col_masks))
    p = np.exp(out)
    # masked rows/cols carry (numerically) zero probability
    assert p[0, 4:6, :].max() < 1e-6
    assert p[1, :, 3:5].max() < 1e-6
    # valid real rows still sum to 1 after renormalization
    np.testing.assert_allclose(p[0, :4, :].sum(-1), 1.0, rtol=1e-3)


def test_strong_diagonal_assignment():
    rng = np.random.default_rng(1)
    k = 5
    scores = jnp.array((10.0 * np.eye(k) - 5.0).astype(np.float32))[None]
    module = LearnableLogOptimalTransport(300)
    variables = module.init(jax.random.key(0), scores)
    p = np.exp(np.asarray(module.apply(variables, scores)))[0]
    # diagonal should dominate each row of the real block
    for i in range(k):
        assert p[i, i] > 0.8 * p[i, :k].sum()


def test_empty_patch_gradient_finite():
    """A fully-masked patch (0 valid rows AND cols — an invalid sampled
    training target) must not poison d(loss)/d(alpha): the dustbin marginal
    log(0) + (-log(0)) = NaN survived loss masking through alpha's summed
    cotangents and made optax.apply_if_finite skip EVERY step (silent
    training freeze, diagnosed round 3 on the real chip)."""
    ot = LearnableLogOptimalTransport(num_iterations=10, use_pallas=False)
    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.normal(size=(3, 5, 6)).astype(np.float32))
    row_masks = jnp.asarray(np.array([[True] * 5, [True] * 5, [False] * 5]))
    col_masks = jnp.asarray(np.array([[True] * 6, [True] * 6, [False] * 6]))
    variables = ot.init(jax.random.key(0), scores, row_masks, col_masks)

    def loss_fn(params, s):
        out = ot.apply({"params": params}, s, row_masks, col_masks)
        # only the two VALID patches contribute, exactly like the masked loss
        return jnp.sum(out[:2] ** 2) / 100.0

    grads_p, grads_s = jax.grad(loss_fn, argnums=(0, 1))(variables["params"], scores)
    assert np.isfinite(float(grads_p["alpha"])), "alpha gradient is NaN"
    assert bool(jnp.all(jnp.isfinite(grads_s[:2]))), "score gradients NaN in valid patches"

    # valid patches' outputs are bit-identical to a batch without the empty one
    out_full = ot.apply(variables, scores, row_masks, col_masks)
    out_sub = ot.apply(variables, scores[:2], row_masks[:2], col_masks[:2])
    np.testing.assert_array_equal(np.asarray(out_full[:2]), np.asarray(out_sub))
