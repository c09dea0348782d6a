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

    `axis_name`: the reference's stack mode concatenates ref+src into ONE
    tensor, so its GroupNorm moments mix both clouds of a pair
    (modules.py:46-50). Our backbone vmaps over the 2-cloud axis instead;
    naming that axis and summing the moment accumulators across it with
    lax.psum reproduces the joint statistics exactly (required for converted
    reference checkpoints to be bit-compatible).
    """

    num_groups: int
    num_channels: int
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        # moments and normalization always in f32: with bf16 activations the
        # statistics would lose ~3 digits otherwise. The f32 intermediates
        # are fusion-local (no HBM round-trip); the output returns to the
        # input dtype so a bf16 activation path stays bf16 end-to-end. For
        # f32 inputs every cast is a no-op and the math is bit-identical.
        xg = x.astype(jnp.float32).reshape(n, g, c // g)
        if masks is None:
            w = jnp.ones((n, 1, 1), jnp.float32)
        else:
            w = masks.astype(jnp.float32)[:, None, None]
        # two-pass moments (E[(x-mean)^2], NOT the one-pass E[x^2]-mean^2
        # shortcut, which loses ~4 digits in f32 when |mean| >> std and
        # breaks torch parity at 2e-5); each pass psums across the cloud
        # axis so joint ref+src statistics stay exact
        count = jnp.sum(w) * (c // g)
        s1 = jnp.sum(xg * w, axis=(0, 2), keepdims=True)
        if self.axis_name is not None:
            count, s1 = (jax.lax.psum(t, self.axis_name) for t in (count, s1))
        denom = jnp.maximum(count, 1.0)
        mean = s1 / denom
        sq = jnp.sum(w * jnp.square(xg - mean), axis=(0, 2), keepdims=True)
        if self.axis_name is not None:
            sq = jax.lax.psum(sq, self.axis_name)
        var = sq / denom
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xg.reshape(n, c) * scale + bias
        if masks is not None:
            out = jnp.where(masks[:, None], out, 0.0)
        return out.astype(x.dtype)
