"""Attention layers: vanilla, RPE (pairwise-embedding), PE (absolute), LRPE.

Ref parity: modules/transformer/vanilla_transformer.py:15-201,
rpe_transformer.py:18-131, pe_transformer.py:15-132, lrpe_transformer.py:19-148,
output_layer.py:6-21, conditional_transformer.py:14-161.

Mask convention: this codebase uses VALIDITY masks (True = attend) everywhere;
the reference's `key_masks` are ignore-masks. Scores for invalid keys are
filled with a large negative before softmax, like the reference's -inf fill
(rpe_transformer.py:64), but finite so fully-masked rows stay NaN-free on
padded data.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ref_geotransformer_tpu.models.embedding import SinusoidalPositionalEmbedding

_NEG = -1e9


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)  # (B, H, N, c)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


def _finish_attention(scores, v, key_weights, key_masks, attention_factors, dropout=None):
    if attention_factors is not None:
        scores = attention_factors[:, None, :, :] * scores
    if key_weights is not None:
        scores = scores * key_weights[:, None, None, :]
    if key_masks is not None:
        scores = jnp.where(key_masks[:, None, None, :], scores, _NEG)
    scores = nn.softmax(scores, axis=-1)
    hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v, preferred_element_type=jnp.float32)
    return _merge_heads(hidden), scores


class MultiHeadAttention(nn.Module):
    """Vanilla scaled dot-product MHA (vanilla_transformer.py:15-76)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, key_weights=None, key_masks=None, attention_factors=None):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32) / d**0.5
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors)


class RPEMultiHeadAttention(nn.Module):
    """MHA with projected pairwise relative embedding term
    (rpe_transformer.py:18-75): score = (q.k + q.proj_p(embed)) / sqrt(d)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_qk, key_weights=None, key_masks=None,
                 attention_factors=None):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        p = nn.Dense(self.d_model, name="proj_p")(embed_qk)  # (B, N, M, C)
        b, n, m, _ = p.shape
        p = p.reshape(b, n, m, h, d).transpose(0, 3, 1, 2, 4)  # (B, H, N, M, c)

        scores_e = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32)
        scores_p = jnp.einsum("bhnc,bhnmc->bhnm", q, p, preferred_element_type=jnp.float32)
        scores = (scores_e + scores_p) / d**0.5
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors)


class PEMultiHeadAttention(nn.Module):
    """Absolute-PE MHA: q/k augmented with projected positional embeddings
    (pe_transformer.py:15-132)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k, key_weights=None, key_masks=None,
                 attention_factors=None):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q)
                         + nn.Dense(self.d_model, name="proj_p_q")(embed_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k)
                         + nn.Dense(self.d_model, name="proj_p_k")(embed_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32) / d**0.5
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors)


class AttentionOutput(nn.Module):
    """Post-attention FFN with residual + LayerNorm (output_layer.py:6-21)."""

    d_model: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states):
        x = nn.Dense(self.d_model * 2, name="expand")(input_states)
        x = {"ReLU": nn.relu, "GELU": nn.gelu, "LeakyReLU": lambda y: nn.leaky_relu(y, 0.01)}[
            self.activation_fn
        ](x)
        x = nn.Dense(self.d_model, name="squeeze")(x)
        return nn.LayerNorm(name="norm")(input_states + x)


class AttentionLayer(nn.Module):
    """MHA -> linear -> residual + LayerNorm (vanilla_transformer.py:79-113)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_states, memory_states, memory_weights=None, memory_masks=None,
                 attention_factors=None):
        hidden, scores = MultiHeadAttention(self.d_model, self.num_heads, name="attention")(
            input_states, memory_states, memory_states,
            key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        return nn.LayerNorm(name="norm")(hidden + input_states), scores


class RPEAttentionLayer(nn.Module):
    """RPE MHA -> linear -> residual + LayerNorm (rpe_transformer.py:78-105)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_weights=None,
                 memory_masks=None, attention_factors=None):
        hidden, scores = RPEMultiHeadAttention(self.d_model, self.num_heads, name="attention")(
            input_states, memory_states, memory_states, position_states,
            key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        return nn.LayerNorm(name="norm")(hidden + input_states), scores


class TransformerLayer(nn.Module):
    """AttentionLayer + FFN output block (vanilla_transformer.py:116-146)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, memory_weights=None, memory_masks=None,
                 attention_factors=None):
        hidden, scores = AttentionLayer(self.d_model, self.num_heads, name="attention")(
            input_states, memory_states, memory_weights=memory_weights, memory_masks=memory_masks,
            attention_factors=attention_factors)
        return AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden), scores


class RPETransformerLayer(nn.Module):
    """RPEAttentionLayer + FFN output block (rpe_transformer.py:108-131)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_weights=None,
                 memory_masks=None, attention_factors=None):
        hidden, scores = RPEAttentionLayer(self.d_model, self.num_heads, name="attention")(
            input_states, memory_states, position_states, memory_weights=memory_weights,
            memory_masks=memory_masks, attention_factors=attention_factors)
        return AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden), scores


class TransformerEncoderLayer(nn.Module):
    """Self-attention encoder layer (vanilla_transformer.py:149-171)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats, masks=None):
        out, _ = TransformerLayer(self.d_model, self.num_heads, self.activation_fn, name="layer")(
            feats, feats, memory_masks=masks)
        return out


class RPEConditionalTransformer(nn.Module):
    """Interleaved self (RPE w/ geometric embedding) and cross (vanilla)
    blocks over the two clouds (conditional_transformer.py:73-117)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    parallel: bool = False

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                            name=f"layers_{i}")
                feats0, _ = layer(feats0, feats0, embeddings0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, embeddings1, memory_masks=masks1)
            elif block == "cross":
                layer = TransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                         name=f"layers_{i}")
                new_feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                if self.parallel:
                    new_feats1, _ = layer(feats1, feats0, memory_masks=masks0)
                else:
                    new_feats1, _ = layer(feats1, new_feats0, memory_masks=masks0)
                feats0, feats1 = new_feats0, new_feats1
            else:
                raise ValueError(f'Unsupported block type "{block}".')
        return feats0, feats1


class VanillaConditionalTransformer(nn.Module):
    """Self/cross blocks without positional embeddings
    (conditional_transformer.py:14-39)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}")
            if block == "self":
                feats0, _ = layer(feats0, feats0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, memory_masks=masks1)
            else:
                # sequential, like the reference: feats1 attends to updated feats0
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
        return feats0, feats1
