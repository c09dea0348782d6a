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
