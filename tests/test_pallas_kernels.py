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

    # pallas path in interpret mode (CPU): monkeypatch the kernel entry to
    # force interpret
    import ref_geotransformer_tpu.models.pallas_kernels as pk

    orig = pk.geometric_embedding_pallas

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pk.geometric_embedding_pallas = interp
    try:
        mod_pl = GeometricStructureEmbedding(c, 0.2, 15.0, k, "max", use_pallas=True)
        got = np.asarray(mod_pl.apply(variables, points, masks))
    finally:
        pk.geometric_embedding_pallas = orig

    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=2e-3)
