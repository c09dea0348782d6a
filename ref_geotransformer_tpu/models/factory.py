"""Layer factories (ref parity: modules/layers/factory.py:6-87 and the
generic conv block at modules/layers/conv_block.py:9-107).

In flax the idiomatic form is a function registry returning constructors /
callables rather than nn.Module factories with registries; kept thin."""

from __future__ import annotations

from typing import Callable, Optional

from flax import linen as nn

from ref_geotransformer_tpu.models.norms import MaskedGroupNorm

_ACT_REGISTRY = {
    "ReLU": nn.relu,
    # ref factory defaults negative_slope=0.2 (factory.py:77-79); the KPConv
    # blocks do NOT use this registry — they hardcode 0.1 (modules.py:115).
    "LeakyReLU": lambda x: nn.leaky_relu(x, 0.2),
    "ELU": nn.elu,
    "GELU": nn.gelu,
    "Sigmoid": nn.sigmoid,
    "Softplus": nn.softplus,
    "Tanh": nn.tanh,
    "Identity": lambda x: x,
}


def build_act_layer(act_cfg: Optional[str]) -> Callable:
    """Activation by name (factory.py:41-56)."""
    if act_cfg is None:
        return _ACT_REGISTRY["Identity"]
    if act_cfg not in _ACT_REGISTRY:
        raise ValueError(f"Unsupported activation: {act_cfg}")
    return _ACT_REGISTRY[act_cfg]


def build_norm_layer(norm_cfg: Optional[str], num_features: int, group_norm: int = 32, name=None):
    """Norm module by name (factory.py:6-38)."""
    if norm_cfg is None:
        return lambda x, masks=None: x
    if norm_cfg in ("LayerNorm",):
        ln = nn.LayerNorm(name=name)
        return lambda x, masks=None: ln(x)
    if norm_cfg in ("GroupNorm",):
        gn = MaskedGroupNorm(group_norm, num_features, name=name)
        return gn
    raise ValueError(f"Unsupported norm: {norm_cfg}")


def build_dropout_layer(p: Optional[float], deterministic: bool = True):
    """Dropout by rate (factory.py:59-68); identity when p is None/0 —
    matching the shipped configs, which never enable dropout."""
    if p is None or p == 0:
        return lambda x: x
    drop = nn.Dropout(rate=p, deterministic=deterministic)
    return drop


class ConvBlock1d(nn.Module):
    """Pointwise conv-norm-act block over (N, C) clouds
    (layers/conv_block.py:9-107 role; unused by shipped models, kept for API
    parity)."""

    out_channels: int
    norm: Optional[str] = "GroupNorm"
    act: Optional[str] = "LeakyReLU"
    group_norm: int = 32

    @nn.compact
    def __call__(self, x, masks=None):
        x = nn.Dense(self.out_channels, name="conv")(x)
        if self.norm == "GroupNorm":
            x = MaskedGroupNorm(self.group_norm, self.out_channels, name="norm")(x, masks)
        elif self.norm == "LayerNorm":
            x = nn.LayerNorm(name="norm")(x)
        return build_act_layer(self.act)(x)
