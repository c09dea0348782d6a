"""KPConv-FPN hierarchical backbone, generic over stage count.

Ref parity: the three experiment backbones are one pattern with different
depths — experiments/geotransformer.3dmatch.../backbone.py:8-87 (4 stages,
decoders to level 1), kitti .../backbone.py (5 stages, decoders to level 1),
modelnet .../backbone.py (3 stages, decoders to level 0). This module
implements that pattern once, parameterized by `num_stages` and `fine_level`.

Stage s (1-based) encoder channel plan (init_dim = d):
    stage 1: ConvBlock(in -> d), Residual(d -> 2d)
    stage s>=2: Residual(strided, 2^(s-1) d -> 2^(s-1) d),
                Residual(-> 2^s d), Residual(2^s d -> 2^s d)
Decoders top-down at level l: concat(enc_l, up(prev)) -> UnaryBlock to
enc_l's width; the last decoder (at fine_level) is a LastUnaryBlock to
output_dim. Returns feats_list fine-to-coarse: [level fine_level, ...,
level S-1], matching the reference's reversed list (backbone.py:76-87).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

from ref_geotransformer_tpu.models.kpconv import (
    ConvBlock,
    LastUnaryBlock,
    ResidualBlock,
    UnaryBlock,
    nearest_upsample,
)


class KPConvFPN(nn.Module):
    input_dim: int
    output_dim: int
    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    num_stages: int = 4
    fine_level: int = 1
    compute_dtype: object = None  # e.g. jnp.bfloat16 for KPConv MXU paths
    # vmap axis name for joint ref+src GroupNorm statistics (the reference's
    # stack-mode GroupNorm mixes both clouds of a pair; see models/norms.py)
    norm_axis_name: object = None
    # end-to-end activation dtype INSIDE the backbone (e.g. jnp.bfloat16):
    # inter-block feature tensors, gather tables, Dense matmuls, and norm
    # outputs all stay narrow (norm statistics are f32; params are f32; the
    # KPConv einsums accumulate f32). Halves the gather/HBM traffic that
    # dominates the backbone. Outputs are cast back to f32 at the boundary
    # so downstream heads are unaffected.
    activation_dtype: object = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, data: Dict) -> List[jnp.ndarray]:
        """Args:
            feats: (N0, input_dim) stacked input features for one cloud.
            data: pyramid dict from build_pyramid (points/masks/neighbors/
                subsampling/upsampling tuples).

        Returns:
            feats_list fine-to-coarse: [(C_fine, output_dim), ...,
            (C_{S-1}, init_dim * 2^S)].
        """
        points = data["points"]
        masks = data["masks"]
        neighbors = data["neighbors"]
        subsampling = data["subsampling"]
        upsampling = data["upsampling"]
        s = self.num_stages
        d = self.init_dim
        r = self.init_radius
        sig = self.init_sigma
        adt = self.activation_dtype
        if adt is not None:
            feats = feats.astype(adt)

        skip_feats = []

        # stage 1
        x = ConvBlock(self.input_dim, d, self.kernel_size, r, sig, self.group_norm,
                      compute_dtype=self.compute_dtype, norm_axis_name=self.norm_axis_name,
                      act_dtype=adt,
                      name="encoder1_1")(feats, points[0], points[0], neighbors[0], masks[0])
        x = ResidualBlock(d, 2 * d, self.kernel_size, r, sig, self.group_norm,
                          compute_dtype=self.compute_dtype, norm_axis_name=self.norm_axis_name,
                          act_dtype=adt,
                          name="encoder1_2")(x, points[0], points[0], neighbors[0], masks[0])
        skip_feats.append(x)

        # stages 2..S
        for stage in range(2, s + 1):
            lvl = stage - 1  # pyramid level of this stage's output
            cin = d * (2 ** (stage - 1))
            cout = d * (2**stage)
            x = ResidualBlock(cin, cin, self.kernel_size, r, sig, self.group_norm, strided=True,
                              compute_dtype=self.compute_dtype, norm_axis_name=self.norm_axis_name,
                              act_dtype=adt, name=f"encoder{stage}_1")(
                x, points[lvl], points[lvl - 1], subsampling[lvl - 1], masks[lvl], masks[lvl - 1])
            r *= 2.0
            sig *= 2.0
            x = ResidualBlock(cin, cout, self.kernel_size, r, sig, self.group_norm,
                              compute_dtype=self.compute_dtype, norm_axis_name=self.norm_axis_name,
                              act_dtype=adt,
                              name=f"encoder{stage}_2")(x, points[lvl], points[lvl], neighbors[lvl], masks[lvl])
            x = ResidualBlock(cout, cout, self.kernel_size, r, sig, self.group_norm,
                              compute_dtype=self.compute_dtype, norm_axis_name=self.norm_axis_name,
                              act_dtype=adt,
                              name=f"encoder{stage}_3")(x, points[lvl], points[lvl], neighbors[lvl], masks[lvl])
            skip_feats.append(x)

        feats_list = [skip_feats[-1]]  # coarsest
        latent = skip_feats[-1]
        for lvl in range(s - 2, self.fine_level - 1, -1):
            up = nearest_upsample(latent, upsampling[lvl])
            latent = jnp.concatenate([up, skip_feats[lvl]], axis=1)
            cat_dim = latent.shape[1]
            if lvl == self.fine_level:
                latent = LastUnaryBlock(cat_dim, self.output_dim, act_dtype=adt,
                                        name=f"decoder{lvl + 1}")(latent)
            else:
                dec_dim = d * (2 ** (lvl + 1))
                latent = UnaryBlock(cat_dim, dec_dim, self.group_norm,
                                    norm_axis_name=self.norm_axis_name, act_dtype=adt,
                                    name=f"decoder{lvl + 1}")(latent, masks[lvl])
            feats_list.append(latent)

        feats_list.reverse()
        if adt is not None:
            # boundary back-cast: downstream heads (transformer, matching,
            # losses) consume f32 features regardless of the backbone dtype
            feats_list = [f.astype(jnp.float32) for f in feats_list]
        return feats_list
