"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ref_geotransformer_tpu.models.pallas_kernels import sinkhorn_log_norm_pallas


def scan_reference(padded_scores, log_mu, log_nu, iters):
    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(padded_scores + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(padded_scores + u[:, :, None], axis=1)
        return (u, v), None

    init = (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
    (u, v), _ = jax.lax.scan(body, init, None, length=iters)
    return padded_scores + u[:, :, None] + v[:, None, :]


def test_sinkhorn_pallas_matches_scan():
    rng = np.random.default_rng(0)
    b, m1, n1 = 5, 9, 7  # deliberately non-multiple of block_b
    scores = jnp.array(rng.normal(size=(b, m1, n1)).astype(np.float32))
    # mark some entries masked like the module does
    scores = scores.at[:, -1, -1].set(-1e12)
    log_mu = jnp.array(rng.normal(size=(b, m1)).astype(np.float32))
    log_nu = jnp.array(rng.normal(size=(b, n1)).astype(np.float32))

    expected = np.asarray(scan_reference(scores, log_mu, log_nu, 30))
    got = np.asarray(
        sinkhorn_log_norm_pallas(scores, log_mu, log_nu, 30, block_b=2, interpret=True)
    )
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_geometric_embedding_pallas_matches_xla():
    import numpy as np
    from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding

    rng = np.random.default_rng(3)
    n, c, k = 64, 32, 3  # n multiple of the 64-tile
    points = jnp.array(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
    masks = jnp.ones((1, n), bool)

    mod_xla = GeometricStructureEmbedding(c, 0.2, 15.0, k, "max", use_pallas=False)
    variables = mod_xla.init(jax.random.key(0), points, masks)
    expected = np.asarray(mod_xla.apply(variables, points, masks))

    # pallas path in interpret mode (CPU): monkeypatch the vjp factory to
    # force interpret
    import ref_geotransformer_tpu.models.pallas_kernels as pk

    orig = pk.make_geometric_embedding_vjp

    def factory(sigma_d, factor_a, tile=64, interpret=False, **kw):
        # force interpret; drop mxu_dtype so the exactness check runs f32
        return orig(sigma_d, factor_a, tile=tile, interpret=True)

    pk.make_geometric_embedding_vjp = factory
    try:
        mod_pl = GeometricStructureEmbedding(c, 0.2, 15.0, k, "max", use_pallas=True)
        got = np.asarray(mod_pl.apply(variables, points, masks))
    finally:
        pk.make_geometric_embedding_vjp = orig

    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=2e-3)


def test_geometric_embedding_vjp_matches_xla_grads():
    import numpy as np
    from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding
    import ref_geotransformer_tpu.models.pallas_kernels as pk

    rng = np.random.default_rng(4)
    n, c, k = 64, 32, 3
    points = jnp.array(rng.uniform(-1, 1, (1, n, 3)).astype(np.float32))
    masks = jnp.ones((1, n), bool)
    g_out = jnp.array(rng.normal(size=(1, n, n, c)).astype(np.float32))

    mod_xla = GeometricStructureEmbedding(c, 0.2, 15.0, k, "max", use_pallas=False)
    variables = mod_xla.init(jax.random.key(0), points, masks)

    def loss_xla(params):
        out = mod_xla.apply({"params": params}, points, masks)
        return jnp.sum(out * g_out)

    grads_xla = jax.grad(loss_xla)(variables["params"])

    # force interpret mode inside the vjp factory
    orig = pk.make_geometric_embedding_vjp

    def factory(sigma_d, factor_a, tile=64, interpret=False, **kw):
        # force interpret; drop mxu_dtype so the exactness check runs f32
        return orig(sigma_d, factor_a, tile=tile, interpret=True)

    pk.make_geometric_embedding_vjp = factory
    try:
        mod_pl = GeometricStructureEmbedding(c, 0.2, 15.0, k, "max", use_pallas=True)

        def loss_pl(params):
            out = mod_pl.apply({"params": params}, points, masks)
            return jnp.sum(out * g_out)

        grads_pl = jax.grad(loss_pl)(variables["params"])
    finally:
        pk.make_geometric_embedding_vjp = orig

    for name in ("proj_d", "proj_a"):
        for leaf in ("kernel", "bias"):
            a = np.asarray(grads_xla[name][leaf])
            b = np.asarray(grads_pl[name][leaf])
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b / scale, a / scale, atol=3e-3,
                                       err_msg=f"{name}.{leaf}")


def test_geometric_embedding_pallas_bf16_mxu_close():
    """bf16 projection operands (the shipped TPU default) stay within bf16
    rounding of the f32 path — sinusoids/accumulation/output remain f32."""
    import numpy as np
    from ref_geotransformer_tpu.models import pallas_kernels as pk

    rng = np.random.default_rng(5)
    n, c, k = 64, 32, 3
    points = jnp.array(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    ref_vecs = jnp.array(rng.uniform(-1, 1, (n, k, 3)).astype(np.float32))
    div_term = jnp.exp(jnp.arange(0, c, 2, dtype=jnp.float32) * (-np.log(10000.0) / c))
    wd = jnp.array(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    bd = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    wa = jnp.array(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    ba = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)

    f32 = pk.geometric_embedding_pallas(
        points, ref_vecs, div_term, wd, bd, wa, ba, 0.2, 180.0 / (15.0 * np.pi),
        interpret=True)
    bf16 = pk.geometric_embedding_pallas(
        points, ref_vecs, div_term, wd, bd, wa, ba, 0.2, 180.0 / (15.0 * np.pi),
        interpret=True, mxu_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(bf16 - f32)))
    scale = float(jnp.max(jnp.abs(f32)))
    assert err <= 0.02 * max(scale, 1.0), (err, scale)


def test_fast_sincos_accuracy():
    """The shared-range-reduction polynomial sincos must stay within 1e-5 of
    numpy over the kernel's real argument range (omegas up to ~1e2 rad:
    d/sigma_d and angle*factor_a, times div_term <= 1)."""
    from ref_geotransformer_tpu.models.pallas_kernels import _fast_sincos

    x = np.concatenate([
        np.linspace(-120.0, 120.0, 200001),
        np.linspace(-np.pi, np.pi, 50001),  # dense near the core range
        np.array([0.0, np.pi, -np.pi, np.pi / 2, 2 * np.pi]),
    ]).astype(np.float32)
    s, c = _fast_sincos(jnp.array(x))
    s, c = np.asarray(s), np.asarray(c)
    assert np.abs(s - np.sin(np.float64(x))).max() < 1e-5
    assert np.abs(c - np.cos(np.float64(x))).max() < 1e-5


def test_geometric_embedding_fast_vs_xla_sincos_paths():
    """fast_sincos=True (default) and =False agree to float tolerance in the
    fused kernel (interpret mode) — the env knob REF_GT_EMB_SINCOS=xla only
    trades speed, not results."""
    from ref_geotransformer_tpu.models.pallas_kernels import geometric_embedding_pallas

    rng = np.random.default_rng(11)
    n, c, k = 64, 32, 3
    points = jnp.array(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    ref_vectors = jnp.array(rng.uniform(-0.3, 0.3, (n, k, 3)).astype(np.float32))
    div_indices = jnp.arange(0, c, 2, dtype=jnp.float32)
    div_term = jnp.exp(div_indices * (-np.log(10000.0) / c))
    wd = jnp.array(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    bd = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    wa = jnp.array(rng.normal(size=(c, c)).astype(np.float32) * 0.1)
    ba = jnp.array(rng.normal(size=(c,)).astype(np.float32) * 0.1)

    args = (points, ref_vectors, div_term, wd, bd, wa, ba, 0.2, 180.0 / (15.0 * np.pi))
    slow = np.asarray(geometric_embedding_pallas(*args, interpret=True, fast_sincos=False))
    fast = np.asarray(geometric_embedding_pallas(*args, interpret=True, fast_sincos=True))
    np.testing.assert_allclose(fast, slow, atol=5e-4, rtol=1e-4)
