"""Learnable log-domain optimal transport (SuperGlue-style Sinkhorn).

Ref parity: modules/sinkhorn/learnable_sinkhorn.py:5-70. The 100-iteration
row/col logsumexp normalization runs as a `lax.scan`, which XLA compiles to a
single fused on-device loop over (B, M+1, N+1) score tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# NOTE: the Pallas path has no custom VJP — callers that differentiate
# through the transport plan must set use_pallas=False (the model does this
# automatically in training mode).


class LearnableLogOptimalTransport(nn.Module):
    num_iterations: int
    inf: float = 1e12
    # None = auto (Pallas VMEM-resident loop on TPU, lax.scan elsewhere)
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        scores: jnp.ndarray,
        row_masks: Optional[jnp.ndarray] = None,
        col_masks: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Args:
            scores: (B, M, N) matching scores.
            row_masks: (B, M) validity.
            col_masks: (B, N) validity.

        Returns:
            (B, M+1, N+1) log assignment with dustbin row/col.
        """
        alpha = self.param("alpha", nn.initializers.ones, ())
        b, m, n = scores.shape
        if row_masks is None:
            row_masks = jnp.ones((b, m), bool)
        if col_masks is None:
            col_masks = jnp.ones((b, n), bool)

        padded_row_valid = jnp.concatenate([row_masks, jnp.ones((b, 1), bool)], axis=1)  # (B, M+1)
        padded_col_valid = jnp.concatenate([col_masks, jnp.ones((b, 1), bool)], axis=1)  # (B, N+1)
        score_valid = jnp.logical_and(padded_row_valid[:, :, None], padded_col_valid[:, None, :])

        padded_col = jnp.broadcast_to(alpha, (b, m, 1))
        padded_row = jnp.broadcast_to(alpha, (b, 1, n + 1))
        padded_scores = jnp.concatenate(
            [jnp.concatenate([scores, padded_col], axis=-1), padded_row], axis=1
        )
        padded_scores = jnp.where(score_valid, padded_scores, -self.inf)

        num_valid_row = jnp.sum(row_masks.astype(scores.dtype), axis=1)
        num_valid_col = jnp.sum(col_masks.astype(scores.dtype), axis=1)
        # Degenerate guard: a fully-masked patch (0 valid rows AND cols —
        # e.g. an invalid sampled training target) would give the dustbin
        # marginal log(0) + (-log(0)) = NaN. The NaN survives loss masking
        # through alpha's gradient (sum over ALL dustbin cotangents), so one
        # empty patch silently freezes training via apply_if_finite. Clamping
        # inside the logs changes only degenerate patches: any patch with
        # >= 1 valid row AND >= 1 valid col is bit-identical; mixed-degenerate
        # patches (0 valid rows but > 0 valid cols, or vice versa) get a
        # finite dustbin marginal instead of -inf — those are always
        # label-masked in the fine-matching loss, like fully-empty ones
        # (torch-parity keeps holding: the reference only ever sees
        # non-degenerate patches, learnable_sinkhorn.py:34-58).
        norm = -jnp.log(jnp.maximum(num_valid_row + num_valid_col, 1.0))  # (B,)

        log_mu = jnp.concatenate(
            [jnp.broadcast_to(norm[:, None], (b, m)),
             (jnp.log(jnp.maximum(num_valid_col, 1.0)) + norm)[:, None]], axis=1
        )
        log_mu = jnp.where(padded_row_valid, log_mu, -self.inf)
        log_nu = jnp.concatenate(
            [jnp.broadcast_to(norm[:, None], (b, n)),
             (jnp.log(jnp.maximum(num_valid_row, 1.0)) + norm)[:, None]], axis=1
        )
        log_nu = jnp.where(padded_col_valid, log_nu, -self.inf)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from ref_geotransformer_tpu.models.pallas_kernels import sinkhorn_log_norm_pallas

            outputs = sinkhorn_log_norm_pallas(padded_scores, log_mu, log_nu, self.num_iterations)
        else:

            def body(carry, _):
                u, v = carry
                u = log_mu - jax.nn.logsumexp(padded_scores + v[:, None, :], axis=2)
                v = log_nu - jax.nn.logsumexp(padded_scores + u[:, :, None], axis=1)
                return (u, v), None

            init = (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
            (u, v), _ = jax.lax.scan(body, init, None, length=self.num_iterations)
            outputs = padded_scores + u[:, :, None] + v[:, None, :]
        return outputs - norm[:, None, None]
