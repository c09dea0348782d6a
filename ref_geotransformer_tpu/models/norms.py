"""Mask-aware normalization layers.

The reference's GroupNorm (modules/kpconv/modules.py:33-50) reshapes the
whole cloud (N, C) to (1, C, N), so group statistics are computed over ALL
points jointly — per-cloud, not per-point. With padded static shapes the
padded rows must be excluded from the statistics or they would bias the
moments, hence the explicit mask handling here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedGroupNorm(nn.Module):
    """GroupNorm over an entire (N, C) cloud with row validity masks.

    Statistics per group g: mean/var over {x[n, c] : masks[n], c in group g},
    matching torch.nn.GroupNorm applied to the unpadded (1, C, N) tensor.
    """

    num_groups: int
    num_channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        xg = x.reshape(n, g, c // g)
        if masks is None:
            mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
            var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
        else:
            w = masks.astype(x.dtype)[:, None, None]
            denom = jnp.maximum(jnp.sum(w) * (c // g), 1.0)
            mean = jnp.sum(xg * w, axis=(0, 2), keepdims=True) / denom
            var = jnp.sum(w * (xg - mean) ** 2, axis=(0, 2), keepdims=True) / denom
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xg.reshape(n, c) * scale + bias
        if masks is not None:
            out = jnp.where(masks[:, None], out, 0.0)
        return out
