"""kpconv_aggregate_pallas vs the module's einsum formulation (interpret
mode): forward equality, gradient equality through the custom VJP, padding
and block-size invariance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.ops.pallas_kpconv import (
    _xla_reference,
    kpconv_aggregate_pallas,
    make_kpconv_aggregate,
)


def _case(m=100, h=17, c=32, k=15, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    neighbors = rng.normal(scale=0.05, size=(m, h, 3)).astype(np.float32)
    feats = rng.normal(size=(m, h, c)).astype(dtype)
    valid = rng.random((m, h)) > 0.2
    kp = rng.normal(scale=0.04, size=(k, 3)).astype(np.float32)
    sigma = 0.06
    return (jnp.array(neighbors), jnp.array(feats), jnp.array(valid),
            jnp.array(kp), sigma)


@pytest.mark.parametrize("m,h,c,block", [(100, 17, 32, 256), (256, 40, 64, 64), (33, 9, 16, 8)])
def test_forward_matches_einsum_reference(m, h, c, block):
    neighbors, feats, valid, kp, sigma = _case(m, h, c)
    got = kpconv_aggregate_pallas(neighbors, feats, valid, kp, sigma,
                                  block_m=block, interpret=True)
    want = _xla_reference(neighbors, feats, valid, kp, sigma)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5, atol=1e-5)


def test_forward_bf16_feats():
    neighbors, feats, valid, kp, sigma = _case(dtype=np.float32)
    feats_bf16 = feats.astype(jnp.bfloat16)
    got = kpconv_aggregate_pallas(neighbors, feats_bf16, valid, kp, sigma, interpret=True)
    want = _xla_reference(neighbors, feats_bf16, valid, kp, sigma)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-2, atol=1e-2)


def test_grad_matches_einsum_reference():
    neighbors, feats, valid, kp, sigma = _case(m=48, h=11, c=16)
    f = make_kpconv_aggregate(sigma, interpret=True)
    vf = valid.astype(jnp.float32)

    def loss_pallas(n, ft):
        return jnp.sum(f(n, ft, vf, kp) ** 2)

    def loss_ref(n, ft):
        return jnp.sum(_xla_reference(n, ft, valid, kp, sigma) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(neighbors, feats)
    gr = jax.grad(loss_ref, argnums=(0, 1))(neighbors, feats)
    # the cotangent g=2*out comes from each path's own forward, so the f32
    # rounding difference of the forwards enters the gradient linearly
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=5e-4, atol=1e-4)


def test_kpconv_module_parity_under_flag(monkeypatch):
    """KPConv forward with REF_GT_PALLAS_KPCONV on == the einsum path."""
    from ref_geotransformer_tpu.models import kpconv as kpconv_mod

    rng = np.random.default_rng(5)
    n, m, h, cin, cout = 60, 40, 9, 16, 24
    s_points = jnp.array(rng.normal(scale=0.3, size=(n, 3)), jnp.float32)
    q_points = jnp.array(rng.normal(scale=0.3, size=(m, 3)), jnp.float32)
    s_feats = jnp.array(rng.normal(size=(n, cin)), jnp.float32)
    idx = rng.integers(0, n + 1, size=(m, h)).astype(np.int32)  # incl. sentinel n
    idx = jnp.array(idx)

    module = kpconv_mod.KPConv(in_channels=cin, out_channels=cout,
                               kernel_size=15, radius=0.3, sigma=0.2)
    variables = module.init(jax.random.key(0), s_feats, q_points, s_points, idx)

    monkeypatch.setattr(kpconv_mod, "_PALLAS_KPCONV", "0")
    want = module.apply(variables, s_feats, q_points, s_points, idx)
    monkeypatch.setattr(kpconv_mod, "_PALLAS_KPCONV", "1")
    got = module.apply(variables, s_feats, q_points, s_points, idx)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5, atol=1e-5)


def test_all_invalid_rows_are_zero():
    neighbors, feats, valid, kp, sigma = _case(m=20, h=5, c=8)
    valid = jnp.zeros_like(valid)
    got = kpconv_aggregate_pallas(neighbors, feats, valid, kp, sigma, interpret=True)
    assert np.abs(np.array(got)).max() == 0.0
