"""Kernel-point convolution (KPConv) and its building blocks, in flax.

Ref parity: modules/kpconv/kpconv.py:10-133 (KPConv forward math),
modules/kpconv/modules.py:53-225 (Unary/Conv/Residual blocks),
modules/kpconv/functional.py:6-90 (nearest_upsample / maxpool / knn
interpolate / global pooling).

TPU mapping: the per-point gather + influence weighting + per-kernel-point
matmul is expressed as two einsums whose contraction XLA fuses and tiles onto
the MXU — (M,K,H)x(M,H,C) then (M,K,C)x(K,C,O) reshaped as one
(M, K*C)@(K*C, O) GEMM. The "shadow point" convention uses fill=1e6 for
coordinates (influence 0 after the clamp) and fill=0 for features, exactly
like the reference's appended rows (kpconv.py:91-103).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ref_geotransformer_tpu.models.kernel_points import load_kernels
from ref_geotransformer_tpu.models.norms import MaskedGroupNorm
from ref_geotransformer_tpu.ops.index import masked_gather

_SHADOW = 1e6

# A fused Pallas influence+contraction kernel was built in r03 and retired
# in r04: its single-lane dynamic slicing does not compile under Mosaic,
# and XLA's einsum chain already runs at the HBM floor for this op
# (0.22 ms at the hottest L0 shape — writing the (M, K, C) accumulator
# alone costs ~0.15 ms of bandwidth; numbers in DESIGN.md r04 §6.3).


def _pack_points_feats(s_points: jnp.ndarray, s_feats: jnp.ndarray, compute_dtype):
    """Build the single gather table. In bf16 mode the f32 coordinates are
    BITCAST into pairs of bf16 lanes (exact bits, no quantization — casting
    absolute coordinates to bf16 would put ~1 cm errors into the influence
    geometry); features are value-cast. Returns (table, coord_width)."""
    if compute_dtype is None:
        return jnp.concatenate([s_points, s_feats], axis=1), 3
    n = s_points.shape[0]
    coord_bits = jax.lax.bitcast_convert_type(s_points, compute_dtype).reshape(n, 6)
    return jnp.concatenate([coord_bits, s_feats.astype(compute_dtype)], axis=1), 6


def _unpack_points(gathered: jnp.ndarray, coord_width: int) -> jnp.ndarray:
    """Recover f32 coordinates from the gathered table prefix."""
    if coord_width == 3:
        return gathered[..., :3]
    bits = gathered[..., :6].reshape(gathered.shape[:-1] + (3, 2))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a (K, Cin, Cout) weight: fan_in =
    K * Cin (torch counts dim-1 as in-channels with receptive field dim0)."""
    fan_in = shape[0] * shape[1]
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class KPConv(nn.Module):
    """Rigid kernel-point convolution.

    Call: (s_feats (N, Cin), q_points (M, 3), s_points (N, 3),
    neighbor_indices (M, H) with sentinel == N) -> (M, Cout).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 for the MXU path
    # activation dtype of the surrounding backbone: when set, the f32-
    # accumulated output is cast back down so inter-block tensors (and the
    # next block's gather table) stay narrow end-to-end
    act_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.weights = self.param(
            "weights", _kaiming_uniform, (self.kernel_size, self.in_channels, self.out_channels)
        )
        # Kernel dispositions: non-trainable buffer (checkpoints may override).
        self.kernel_points_var = self.variable(
            "buffers",
            "kernel_points",
            lambda: jnp.asarray(load_kernels(self.radius, self.kernel_size)),
        )
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

    def __call__(self, s_feats, q_points, s_points, neighbor_indices):
        # ONE fused gather for coordinates + features (the backbone's
        # dominant memory op — two separate gathers would double it); empty
        # slots (sentinel index) are masked out of the influence weights
        # instead of the reference's +inf shadow point (same result: zero
        # influence, kpconv.py:91-100).
        valid = neighbor_indices < s_points.shape[0]  # (M, H)
        table, cw = _pack_points_feats(s_points, s_feats, self.compute_dtype)
        gathered = masked_gather(table, neighbor_indices, fill_value=0.0)  # (M, H, cw+C)
        neighbors = _unpack_points(gathered, cw) - q_points[:, None, :]
        neighbor_feats = gathered[..., cw:]
        return self.aggregate(neighbors, neighbor_feats, valid)

    def aggregate(self, neighbors, neighbor_feats, valid):
        """KPConv math on pre-gathered neighborhoods: relative coords
        (M, H, 3), features (M, H, C), validity (M, H). Exposed so callers
        (e.g. strided ResidualBlock) can share one gather across consumers.
        """
        weights = self.weights
        kernel_points = self.kernel_points_var.value

        w = weights.astype(self.compute_dtype) if self.compute_dtype is not None else weights
        # influence via the |n|^2 - 2 n.k + |k|^2 expansion: one
        # (M*H, 3)x(3, K) MXU matmul, no (M, H, K, 3) intermediate
        n_sq = jnp.sum(neighbors**2, axis=-1)  # (M, H)
        k_sq = jnp.sum(kernel_points**2, axis=-1)  # (K,)
        nk = jnp.einsum(
            "mhd,kd->mhk", neighbors, kernel_points, preferred_element_type=jnp.float32
        )
        sq_distances = jnp.maximum(n_sq[:, :, None] - 2.0 * nk + k_sq[None, None, :], 0.0)
        neighbor_weights = jnp.maximum(1.0 - jnp.sqrt(sq_distances) / self.sigma, 0.0)
        neighbor_weights = jnp.where(valid[:, :, None], neighbor_weights, 0.0)

        if self.compute_dtype is not None:
            nw = neighbor_weights.astype(self.compute_dtype)
            neighbor_feats = neighbor_feats.astype(self.compute_dtype)
        else:
            nw = neighbor_weights
        weighted_feats = jnp.einsum(
            "mhk,mhc->mkc", nw, neighbor_feats, preferred_element_type=jnp.float32
        )
        output_feats = jnp.einsum(
            "mkc,kco->mo", weighted_feats.astype(w.dtype), w, preferred_element_type=jnp.float32
        )

        # normalize by the number of neighbors with positive feature sum
        # (reference-exact semantics, kpconv.py:113-116)
        neighbor_num = jnp.sum(
            (jnp.sum(neighbor_feats.astype(jnp.float32), axis=-1) > 0.0).astype(jnp.float32), axis=-1
        )
        neighbor_num = jnp.maximum(neighbor_num, 1.0)
        output_feats = output_feats / neighbor_num[:, None]

        if self.use_bias:
            output_feats = output_feats + self.bias
        if self.act_dtype is not None:
            output_feats = output_feats.astype(self.act_dtype)
        return output_feats


def nearest_upsample(x: jnp.ndarray, upsample_indices: jnp.ndarray) -> jnp.ndarray:
    """Copy the nearest (first, distance-sorted) support feature per query
    (functional.py:6-22)."""
    return masked_gather(x, upsample_indices[:, 0], fill_value=0.0)


def knn_interpolate(
    s_feats: jnp.ndarray,
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    neighbor_indices: jnp.ndarray,
    k: int,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance-weighted kNN interpolation (functional.py:25-51)."""
    n = s_points.shape[0]
    knn_indices = neighbor_indices[:, :k]
    knn_points = masked_gather(s_points, knn_indices, fill_value=0.0)
    knn_feats = masked_gather(s_feats, knn_indices, fill_value=0.0)
    knn_sq = jnp.sum((q_points[:, None, :] - knn_points) ** 2, axis=-1)
    knn_masks = (knn_indices < n).astype(s_feats.dtype)
    knn_weights = knn_masks / (knn_sq + eps)
    knn_weights = knn_weights / (jnp.sum(knn_weights, axis=1, keepdims=True) + eps)
    return jnp.sum(knn_feats * knn_weights[:, :, None], axis=1)


def maxpool(x: jnp.ndarray, neighbor_indices: jnp.ndarray) -> jnp.ndarray:
    """Max over neighbor features; empty slots contribute 0 (functional.py:54-67).

    Note the reference pads with a zero row, so its max is also implicitly
    clamped at >= 0 for rows with any empty slot; exact parity.
    """
    neighbor_feats = masked_gather(x, neighbor_indices, fill_value=0.0)
    return jnp.max(neighbor_feats, axis=1)


def global_avgpool(x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over one cloud (functional.py:70-90 without the host loop)."""
    w = masks.astype(x.dtype)[:, None]
    return jnp.sum(x * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


class UnaryBlock(nn.Module):
    """Linear -> GroupNorm -> LeakyReLU(0.1) (modules.py:53-86)."""

    in_channels: int
    out_channels: int
    group_norm: int
    has_relu: bool = True
    use_bias: bool = True
    layer_norm: bool = False
    norm_axis_name: Optional[str] = None
    act_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, masks: Optional[jnp.ndarray] = None):
        # act_dtype keeps the matmul + its output in the backbone's
        # activation dtype (params stay f32; flax casts the kernel per-op)
        x = nn.Dense(self.out_channels, use_bias=self.use_bias,
                     dtype=self.act_dtype, name="mlp")(x)
        if self.layer_norm:
            x = nn.LayerNorm(name="norm")(x)
        else:
            x = MaskedGroupNorm(self.group_norm, self.out_channels,
                                axis_name=self.norm_axis_name, name="norm")(x, masks)
        if self.has_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class LastUnaryBlock(nn.Module):
    """Plain linear head (modules.py:89-106)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True
    act_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels, use_bias=self.use_bias,
                        dtype=self.act_dtype, name="mlp")(x)


class ConvBlock(nn.Module):
    """KPConv -> GroupNorm -> LeakyReLU (modules.py:109-147)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    negative_slope: float = 0.1
    use_bias: bool = True
    layer_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    norm_axis_name: Optional[str] = None
    act_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, q_masks=None):
        x = KPConv(
            self.in_channels, self.out_channels, self.kernel_size, self.radius, self.sigma,
            use_bias=self.use_bias, compute_dtype=self.compute_dtype,
            act_dtype=self.act_dtype, name="KPConv",
        )(s_feats, q_points, s_points, neighbor_indices)
        if self.layer_norm:
            x = nn.LayerNorm(name="norm")(x)
        else:
            x = MaskedGroupNorm(self.group_norm, self.out_channels,
                                axis_name=self.norm_axis_name, name="norm")(x, q_masks)
        return nn.leaky_relu(x, self.negative_slope)


class ResidualBlock(nn.Module):
    """ResNet bottleneck around KPConv (modules.py:150-225); strided variant
    uses a maxpool shortcut over the subsampling table."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False
    use_bias: bool = True
    layer_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    norm_axis_name: Optional[str] = None
    act_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, q_masks=None, s_masks=None):
        if s_masks is None:
            s_masks = q_masks  # non-strided blocks: queries == supports
        mid = self.out_channels // 4

        if self.in_channels != mid:
            x = UnaryBlock(self.in_channels, mid, self.group_norm, use_bias=self.use_bias,
                           layer_norm=self.layer_norm, norm_axis_name=self.norm_axis_name,
                           act_dtype=self.act_dtype, name="unary1")(s_feats, s_masks)
        else:
            x = s_feats

        conv = KPConv(mid, mid, self.kernel_size, self.radius, self.sigma, use_bias=self.use_bias,
                      compute_dtype=self.compute_dtype, act_dtype=self.act_dtype, name="KPConv")
        if self.strided:
            # strided blocks need BOTH the conv's neighborhoods and a maxpool
            # of the raw input over the same indices — fuse into ONE gather
            # (gather cost is per-row, not per-byte, on TPU)
            valid = neighbor_indices < s_points.shape[0]
            table, cw = _pack_points_feats(
                s_points, jnp.concatenate([x, s_feats.astype(x.dtype)], axis=1), self.compute_dtype
            )
            gathered = masked_gather(table, neighbor_indices, fill_value=0.0)
            neighbors = _unpack_points(gathered, cw) - q_points[:, None, :]
            x = conv.aggregate(neighbors, gathered[..., cw : cw + mid], valid)
            shortcut = jnp.max(gathered[..., cw + mid :].astype(s_feats.dtype), axis=1)
        else:
            x = conv(x, q_points, s_points, neighbor_indices)
            shortcut = s_feats
        if self.layer_norm:
            x = nn.LayerNorm(name="norm_conv")(x)
        else:
            x = MaskedGroupNorm(self.group_norm, mid,
                                axis_name=self.norm_axis_name, name="norm_conv")(x, q_masks)
        x = nn.leaky_relu(x, 0.1)

        x = UnaryBlock(mid, self.out_channels, self.group_norm, has_relu=False,
                       use_bias=self.use_bias, layer_norm=self.layer_norm,
                       norm_axis_name=self.norm_axis_name, act_dtype=self.act_dtype,
                       name="unary2")(x, q_masks)
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(self.in_channels, self.out_channels, self.group_norm, has_relu=False,
                                  use_bias=self.use_bias, layer_norm=self.layer_norm,
                                  norm_axis_name=self.norm_axis_name, act_dtype=self.act_dtype,
                                  name="unary_shortcut")(shortcut, q_masks)

        return nn.leaky_relu(x + shortcut, 0.1)
