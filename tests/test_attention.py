"""Attention-layer semantics: the q-side RPE projection rewrite must equal
the naive proj_p(embedding) formulation; masked softmax behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.models.attention import (
    MultiHeadAttention,
    RPEMultiHeadAttention,
    RPEConditionalTransformer,
)


def naive_rpe_scores(params, input_q, input_k, embed_qk, num_heads):
    """Reference formulation (rpe_transformer.py:54-58): project the embedding
    tensor, then contract with q."""
    d_model = input_q.shape[-1]
    d = d_model // num_heads

    def dense(x, p):
        return x @ p["kernel"] + p["bias"]

    def split(x):
        b, n, c = x.shape
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    q = split(dense(input_q, params["proj_q"]))
    k = split(dense(input_k, params["proj_k"]))
    pk = params["proj_p_kernel"]
    pb = params["proj_p_bias"]
    p = embed_qk @ pk + pb  # (B, N, M, C)
    b, n, m, _ = p.shape
    p = p.reshape(b, n, m, num_heads, d).transpose(0, 3, 1, 2, 4)
    scores_e = jnp.einsum("bhnc,bhmc->bhnm", q, k)
    scores_p = jnp.einsum("bhnc,bhnmc->bhnm", q, p)
    return (scores_e + scores_p) / d**0.5


def test_rpe_q_projection_rewrite_matches_naive():
    rng = np.random.default_rng(0)
    b, n, m, c, h = 1, 12, 10, 32, 4
    input_q = jnp.array(rng.normal(size=(b, n, c)).astype(np.float32))
    input_k = jnp.array(rng.normal(size=(b, m, c)).astype(np.float32))
    embed = jnp.array(rng.normal(size=(b, n, m, c)).astype(np.float32))

    module = RPEMultiHeadAttention(c, h)
    variables = module.init(jax.random.key(0), input_q, input_k, input_k, embed)
    out, scores = module.apply(variables, input_q, input_k, input_k, embed)

    naive = naive_rpe_scores(variables["params"], input_q, input_k, embed, h)
    naive_soft = jax.nn.softmax(naive, axis=-1)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(naive_soft), atol=1e-5)


def test_masked_attention_ignores_invalid_keys():
    rng = np.random.default_rng(1)
    b, n, c, h = 1, 8, 16, 2
    x = jnp.array(rng.normal(size=(b, n, c)).astype(np.float32))
    module = MultiHeadAttention(c, h)
    variables = module.init(jax.random.key(0), x, x, x)

    masks = jnp.array([[True] * 5 + [False] * 3])
    _, scores = module.apply(variables, x, x, x, key_masks=masks)
    # no attention mass on masked keys
    assert float(np.asarray(scores)[..., 5:].max()) < 1e-6

    # output for valid queries is independent of masked-key content
    x2 = x.at[:, 5:].set(99.0)
    out1, _ = module.apply(variables, x, x, x, key_masks=masks)
    out2, _ = module.apply(variables, x2, x, x2, key_masks=masks)
    np.testing.assert_allclose(np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), atol=1e-4)


def test_conditional_transformer_runs():
    rng = np.random.default_rng(2)
    b, n, m, c = 1, 10, 9, 32
    f0 = jnp.array(rng.normal(size=(b, n, c)).astype(np.float32))
    f1 = jnp.array(rng.normal(size=(b, m, c)).astype(np.float32))
    e0 = jnp.array(rng.normal(size=(b, n, n, c)).astype(np.float32))
    e1 = jnp.array(rng.normal(size=(b, m, m, c)).astype(np.float32))
    module = RPEConditionalTransformer(("self", "cross"), c, 4)
    variables = module.init(jax.random.key(0), f0, f1, e0, e1)
    o0, o1 = module.apply(variables, f0, f1, e0, e1)
    assert o0.shape == f0.shape and o1.shape == f1.shape
    assert np.isfinite(np.asarray(o0)).all()


def test_dropout_wiring():
    """dropout is honored when configured (reference rpe_transformer.py:66-67,
    output_layer.py:19): deterministic application is a no-op and equals the
    dropout=None module on the same params; stochastic application with an
    rng changes the output; dropout=None stays rng-free."""
    from ref_geotransformer_tpu.models.attention import RPETransformerLayer

    rng = np.random.default_rng(3)
    b, n, c, h = 1, 6, 8, 2
    x = jnp.array(rng.normal(size=(b, n, c)).astype(np.float32))
    e = jnp.array(rng.normal(size=(b, n, n, c)).astype(np.float32))

    plain = RPETransformerLayer(c, h)
    dropped = RPETransformerLayer(c, h, dropout=0.5)
    variables = plain.init(jax.random.key(0), x, x, e)

    out_plain, _ = plain.apply(variables, x, x, e)
    # deterministic (eval) mode: dropout layers are identity
    out_det, _ = dropped.apply(variables, x, x, e, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(out_plain), atol=1e-6)
    # train mode: needs the 'dropout' rng and must actually perturb
    out_train, _ = dropped.apply(
        variables, x, x, e, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    assert not np.allclose(np.asarray(out_train), np.asarray(out_plain), atol=1e-4)
    assert np.all(np.isfinite(np.asarray(out_train)))
