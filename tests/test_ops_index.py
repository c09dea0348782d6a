"""masked_gather: sentinel semantics, the custom vmap rule (batch axes fold
into row offsets — the TPU fast path), and the custom_vjp backward, all
checked against the naive pad-row-and-take formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.ops.index import masked_gather

rng = np.random.default_rng(7)
N, M, H, C, B = 11, 7, 5, 3, 4


def naive(d, i, f):
    n = d.shape[0]
    pad = jnp.full((1,) + d.shape[1:], f, d.dtype)
    return jnp.take(jnp.concatenate([d, pad], 0), jnp.minimum(i, n), axis=0)


@pytest.fixture(scope="module")
def arrays():
    data = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N + 1, (M, H)), jnp.int32)  # includes sentinel
    bdata = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    bidx = jnp.asarray(rng.integers(0, N + 1, (B, M, H)), jnp.int32)
    return data, idx, bdata, bidx


def test_sentinel_fill(arrays):
    data, idx, _, _ = arrays
    out = np.asarray(masked_gather(data, idx, fill_value=-2.5))
    d, i = np.asarray(data), np.asarray(idx)
    exp = np.where((i < N)[..., None], d[np.minimum(i, N - 1)], -2.5)
    np.testing.assert_allclose(out, exp)


@pytest.mark.parametrize("mode", ["both", "idx_only", "data_only", "nested"])
def test_vmap_rule_matches_per_element(arrays, mode):
    data, idx, bdata, bidx = arrays
    if mode == "both":
        out = jax.vmap(lambda d, i: masked_gather(d, i, -1.0))(bdata, bidx)
        ref = jnp.stack([naive(bdata[b], bidx[b], -1.0) for b in range(B)])
    elif mode == "idx_only":
        out = jax.vmap(lambda i: masked_gather(data, i, 0.5))(bidx)
        ref = jnp.stack([naive(data, bidx[b], 0.5) for b in range(B)])
    elif mode == "data_only":
        out = jax.vmap(lambda d: masked_gather(d, idx, 0.0))(bdata)
        ref = jnp.stack([naive(bdata[b], idx, 0.0) for b in range(B)])
    else:
        nd = jnp.asarray(rng.normal(size=(2, B, N, C)), jnp.float32)
        ni = jnp.asarray(rng.integers(0, N + 1, (2, B, M, H)), jnp.int32)
        out = jax.vmap(jax.vmap(lambda d, i: masked_gather(d, i, -1.0)))(nd, ni)
        ref = jnp.stack(
            [jnp.stack([naive(nd[a, b], ni[a, b], -1.0) for b in range(B)]) for a in range(2)]
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_grad_matches_naive(arrays):
    data, idx, bdata, bidx = arrays

    def loss_mine(d):
        return jnp.sum(jnp.sin(jax.vmap(lambda dd, i: masked_gather(dd, i, 0.0))(d, bidx)))

    def loss_naive(d):
        return jnp.sum(jnp.sin(jax.vmap(lambda dd, i: naive(dd, i, 0.0))(d, bidx)))

    g1 = jax.jit(jax.grad(loss_mine))(bdata)
    g2 = jax.grad(loss_naive)(bdata)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    # unbatched grad too
    g1 = jax.grad(lambda d: jnp.sum(jnp.cos(masked_gather(d, idx, 0.0))))(data)
    g2 = jax.grad(lambda d: jnp.sum(jnp.cos(naive(d, idx, 0.0))))(data)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_fill_value_grad(arrays):
    data, idx, _, _ = arrays
    gf = jax.grad(lambda f: jnp.sum(masked_gather(data, idx, f)))(0.3)
    n_invalid_slots = int(np.sum(np.asarray(idx) >= N)) * C
    assert float(gf) == pytest.approx(n_invalid_slots)


def test_one_dim_data(arrays):
    _, idx, _, bidx = arrays
    d1 = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    out = jax.vmap(lambda i: masked_gather(d1, i, 0.0))(bidx)
    ref = jnp.stack([naive(d1, bidx[b], 0.0) for b in range(B)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    g = jax.grad(lambda d: jnp.sum(masked_gather(d, idx, 0.0) ** 2))(d1)
    assert g.shape == (N,)
