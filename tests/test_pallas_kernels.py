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
