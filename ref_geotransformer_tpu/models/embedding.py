"""Positional / geometric structure embeddings.

Ref parity: modules/transformer/positional_embedding.py:8-65 and
modules/geotransformer/geotransformer.py:9-72 (pair-wise distance + triplet
angle embedding, the SE(3)-invariant heart of GeoTransformer).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ref_geotransformer_tpu.ops.pairwise import pairwise_distance


class SinusoidalPositionalEmbedding(nn.Module):
    """sin/cos embedding of continuous indices (positional_embedding.py:8-34)."""

    d_model: int

    @nn.compact
    def __call__(self, emb_indices: jnp.ndarray) -> jnp.ndarray:
        assert self.d_model % 2 == 0
        div_indices = jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
        div_term = jnp.exp(div_indices * (-np.log(10000.0) / self.d_model))
        omegas = emb_indices[..., None, None] * div_term[:, None]  # (*, d/2, 1)
        emb = jnp.concatenate([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)  # (*, d/2, 2)
        emb = emb.reshape(emb_indices.shape + (self.d_model,))
        return jax.lax.stop_gradient(emb)


class LearnablePositionalEmbedding(nn.Module):
    """Embedding bank + LayerNorm, indices clamped (positional_embedding.py:37-65)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, emb_indices: jnp.ndarray) -> jnp.ndarray:
        table = nn.Embed(self.num_embeddings, self.embedding_dim, name="embeddings")
        idx = jnp.minimum(emb_indices.astype(jnp.int32), self.num_embeddings - 1)
        emb = table(idx)
        return nn.LayerNorm(name="norm")(emb)


class GeometricStructureEmbedding(nn.Module):
    """Pair-distance + triplet-angle embedding over superpoints
    (geotransformer.py:9-72), mask-aware for padded nodes.

    Output: (B, N, N, hidden_dim). With use_pallas (auto on TPU), the fused
    tile kernel in models/pallas_kernels.py computes sinusoids + projections
    + angle-max without the (B, N, N, k, C) HBM intermediate; forward-only,
    so the model disables it in training mode.
    """

    hidden_dim: int
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    use_pallas: Optional[bool] = None

    def _knn_ref_vectors(self, points: jnp.ndarray, masks: Optional[jnp.ndarray]):
        """(B, N, k, 3) vectors to each node's k nearest valid nodes."""
        k = self.angle_k
        dist_map = jnp.sqrt(pairwise_distance(points, points))  # (B, N, N)
        knn_dist = dist_map
        if masks is not None:
            knn_dist = jnp.where(masks[:, None, :], knn_dist, 1e12)
        # k+1 nearest, drop self (geotransformer.py:42-43)
        _, knn_indices = jax.lax.top_k(-knn_dist, k + 1)
        knn_indices = knn_indices[:, :, 1:]  # (B, N, k)
        knn_points = jax.vmap(lambda pts, idx: pts[idx])(points, knn_indices)  # (B, N, k, 3)
        return knn_points - points[:, :, None, :], dist_map

    def get_embedding_indices(self, points: jnp.ndarray, masks: Optional[jnp.ndarray] = None):
        """d_indices (B, N, N), a_indices (B, N, N, k)."""
        ref_vectors, dist_map = self._knn_ref_vectors(points, masks)
        d_indices = dist_map / self.sigma_d
        anc_vectors = points[:, None, :, :] - points[:, :, None, :]  # (B, N, N, 3)
        ref_vec = ref_vectors[:, :, None, :, :]  # (B, N, 1, k, 3)
        anc_vec = anc_vectors[:, :, :, None, :]  # (B, N, N, 1, 3)
        sin_values = jnp.linalg.norm(jnp.cross(ref_vec, anc_vec), axis=-1)  # (B, N, N, k)
        cos_values = jnp.sum(ref_vec * anc_vec, axis=-1)
        angles = jnp.arctan2(sin_values, cos_values)
        a_indices = angles * self._factor_a()
        return d_indices, a_indices

    def _factor_a(self) -> float:
        return 180.0 / (self.sigma_a * np.pi)

    @nn.compact
    def __call__(self, points: jnp.ndarray, masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, _ = points.shape
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        use_pallas = use_pallas and self.reduction_a == "max" and n % 64 == 0

        dense_d = nn.Dense(self.hidden_dim, name="proj_d")
        dense_a = nn.Dense(self.hidden_dim, name="proj_a")

        if use_pallas:
            from ref_geotransformer_tpu.models.pallas_kernels import make_geometric_embedding_vjp

            # materialize the Dense params, then hand their raw arrays to the
            # fused kernel (checkpoint layout unchanged)
            dummy = jnp.zeros((1, self.hidden_dim))
            dense_d(dummy)
            dense_a(dummy)
            pd = self.get_variable("params", "proj_d")
            pa = self.get_variable("params", "proj_a")
            div_indices = jnp.arange(0, self.hidden_dim, 2, dtype=jnp.float32)
            div_term = jnp.exp(div_indices * (-np.log(10000.0) / self.hidden_dim))

            # The module's sinusoid layout interleaves [sin0, cos0, sin1, ...]
            # (positional_embedding.py:28-33); the kernel emits
            # [sin..., cos...]. Permute the projection rows so
            # emb_concat @ W_perm == emb_interleaved @ W exactly.
            half = self.hidden_dim // 2
            perm = jnp.concatenate(
                [2 * jnp.arange(half, dtype=jnp.int32), 2 * jnp.arange(half, dtype=jnp.int32) + 1]
            )
            wd_k = pd["kernel"][perm]
            wa_k = pa["kernel"][perm]

            ref_vectors, _ = self._knn_ref_vectors(points, masks)
            ref_vectors = jax.lax.stop_gradient(ref_vectors)
            # custom-VJP kernel: projection-parameter gradients flow (the
            # weight permutation above is a differentiable gather, so grads
            # land back on the Dense params automatically)
            # REF_GT_EMB_MXU=bf16 casts the projection matmul operands (f32
            # sinusoids/accumulation/output stay). Measured at full caps
            # (N=1024, C=256): NO win — 25.25 vs 25.31 ms — the kernel is
            # transcendental-bound (~1G sin/cos per call), not matmul-bound
            # (DESIGN.md r04), so the default stays f32 (zero numerics drift).
            mxu_dtype = jnp.bfloat16 if os.environ.get("REF_GT_EMB_MXU", "f32") == "bf16" else None
            # REF_GT_EMB_SINCOS=xla restores XLA's precise sin/cos inside the
            # kernel; default 'fast' uses the shared-range-reduction
            # polynomial pair (max abs err 7e-7; the kernel is
            # transcendental-bound — chip A/B in DESIGN.md r05)
            fast_sincos = os.environ.get("REF_GT_EMB_SINCOS", "fast") != "xla"
            fn = make_geometric_embedding_vjp(self.sigma_d, self._factor_a(),
                                              mxu_dtype=mxu_dtype, fast_sincos=fast_sincos)
            outs = [
                fn(
                    jax.lax.stop_gradient(points[i]),
                    ref_vectors[i],
                    div_term,
                    wd_k,
                    pd["bias"],
                    wa_k,
                    pa["bias"],
                )
                for i in range(b)
            ]
            return jnp.stack(outs, axis=0)

        d_indices, a_indices = self.get_embedding_indices(points, masks)
        d_indices = jax.lax.stop_gradient(d_indices)
        a_indices = jax.lax.stop_gradient(a_indices)

        embed = SinusoidalPositionalEmbedding(self.hidden_dim, name="embedding")
        d_emb = dense_d(embed(d_indices))  # (B, N, N, C)
        a_emb = dense_a(embed(a_indices))  # (B, N, N, k, C)
        if self.reduction_a == "max":
            a_emb = jnp.max(a_emb, axis=3)
        elif self.reduction_a == "mean":
            a_emb = jnp.mean(a_emb, axis=3)
        else:
            raise ValueError(f"Unsupported reduction mode: {self.reduction_a}.")
        return d_emb + a_emb
