"""Attention layers: vanilla, RPE (pairwise-embedding), PE (absolute), LRPE.

Ref parity: modules/transformer/vanilla_transformer.py:15-201,
rpe_transformer.py:18-131, pe_transformer.py:15-132, lrpe_transformer.py:19-148,
output_layer.py:6-21, conditional_transformer.py:14-161.

Mask convention: this codebase uses VALIDITY masks (True = attend) everywhere;
the reference's `key_masks` are ignore-masks. Scores for invalid keys are
filled with a large negative before softmax, like the reference's -inf fill
(rpe_transformer.py:64), but finite so fully-masked rows stay NaN-free on
padded data.

Dropout: mirrors the reference's three sites per layer — softmaxed attention
scores (vanilla_transformer.py:64, rpe_transformer.py:66-67), the
post-attention linear (rpe_transformer.py:102), and the FFN squeeze output
(output_layer.py:19). `dropout=None` (every shipped config) is a no-op;
when set, training callers pass `deterministic=False` and supply an rng
under the 'dropout' collection. Returned attention scores are pre-dropout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ref_geotransformer_tpu.models.embedding import SinusoidalPositionalEmbedding

_NEG = -1e9


def _score_dropout(rate: Optional[float], deterministic: bool):
    """Dropout closure over softmaxed attention scores (the reference's
    build_dropout_layer site, rpe_transformer.py:66-67); None/0 -> no-op."""
    if not rate:
        return None
    layer = nn.Dropout(rate, name="dropout")
    return lambda s: layer(s, deterministic=deterministic)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)  # (B, H, N, c)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


def _finish_attention(scores, v, key_weights, key_masks, attention_factors, dropout_fn=None):
    if attention_factors is not None:
        scores = attention_factors[:, None, :, :] * scores
    if key_weights is not None:
        scores = scores * key_weights[:, None, None, :]
    if key_masks is not None:
        scores = jnp.where(key_masks[:, None, None, :], scores, _NEG)
    scores = nn.softmax(scores, axis=-1)
    probs = scores if dropout_fn is None else dropout_fn(scores)
    hidden = jnp.einsum("bhnm,bhmc->bhnc", probs, v, preferred_element_type=jnp.float32)
    return _merge_heads(hidden), scores


class MultiHeadAttention(nn.Module):
    """Vanilla scaled dot-product MHA (vanilla_transformer.py:15-76)."""

    d_model: int
    num_heads: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_q, input_k, input_v, key_weights=None, key_masks=None,
                 attention_factors=None, deterministic: bool = True):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32) / d**0.5
        drop = _score_dropout(self.dropout, deterministic)
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors, drop)


class RPEMultiHeadAttention(nn.Module):
    """MHA with pairwise relative-embedding score term
    (rpe_transformer.py:18-75): score = (q.k + q.proj_p(embed)) / sqrt(d).

    TPU optimization (exact, not approximate): the reference projects the
    (B, N, M, C) embedding tensor through proj_p per layer — an O(N^2 C^2)
    GEMM (~68 GFLOP at N=1024, C=256) producing a (B, H, N, M, c) tensor.
    Since q . (W_p e + b_p) == (W_p^T q) . e + q . b_p, we instead pull W_p
    onto q (O(N C^2)) and contract the projected queries against the raw
    embedding (O(N^2 C)) — ~250x fewer FLOPs for this term and no 5-D
    intermediate. Parameters keep nn.Dense layout ('proj_p': kernel (C, C),
    bias (C,)) so checkpoints map 1:1.
    """

    d_model: int
    num_heads: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_qk, key_weights=None, key_masks=None,
                 attention_factors=None, deterministic: bool = True):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)  # (B, H, N, c)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)

        p_kernel = self.param(
            "proj_p_kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model)
        )  # maps embed (C) -> projected (C); column blocks of size c per head
        p_bias = self.param("proj_p_bias", nn.initializers.zeros, (self.d_model,))

        # W_p^T q: (B, H, N, c) x (C, H, c) -> (B, H, N, C)
        w = p_kernel.reshape(self.d_model, h, d)
        qp = jnp.einsum("bhnc,dhc->bhnd", q, w, preferred_element_type=jnp.float32)
        # q . b_p per head: (B, H, N)
        qb = jnp.einsum("bhnc,hc->bhn", q, p_bias.reshape(h, d))

        scores_e = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32)
        scores_p = jnp.einsum(
            "bhnd,bnmd->bhnm", qp, embed_qk, preferred_element_type=jnp.float32
        ) + qb[..., None]
        scores = (scores_e + scores_p) / d**0.5
        drop = _score_dropout(self.dropout, deterministic)
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors, drop)


class PEMultiHeadAttention(nn.Module):
    """Absolute-PE MHA: q/k augmented with projected positional embeddings
    (pe_transformer.py:15-132)."""

    d_model: int
    num_heads: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k, key_weights=None, key_masks=None,
                 attention_factors=None, deterministic: bool = True):
        h = self.num_heads
        d = self.d_model // h
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q)
                         + nn.Dense(self.d_model, name="proj_p_q")(embed_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k)
                         + nn.Dense(self.d_model, name="proj_p_k")(embed_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32) / d**0.5
        drop = _score_dropout(self.dropout, deterministic)
        return _finish_attention(scores, v, key_weights, key_masks, attention_factors, drop)


class AttentionOutput(nn.Module):
    """Post-attention FFN with residual + LayerNorm (output_layer.py:6-21)."""

    d_model: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, deterministic: bool = True):
        x = nn.Dense(self.d_model * 2, name="expand")(input_states)
        x = {"ReLU": nn.relu, "GELU": nn.gelu, "LeakyReLU": lambda y: nn.leaky_relu(y, 0.01)}[
            self.activation_fn
        ](x)
        x = nn.Dense(self.d_model, name="squeeze")(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, name="dropout")(x, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(input_states + x)


class AttentionLayer(nn.Module):
    """MHA -> linear -> residual + LayerNorm (vanilla_transformer.py:79-113)."""

    d_model: int
    num_heads: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, memory_states, memory_weights=None, memory_masks=None,
                 attention_factors=None, deterministic: bool = True):
        hidden, scores = MultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                            name="attention")(
            input_states, memory_states, memory_states,
            key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors,
            deterministic=deterministic)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        if self.dropout:
            hidden = nn.Dropout(self.dropout, name="dropout")(hidden, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(hidden + input_states), scores


class RPEAttentionLayer(nn.Module):
    """RPE MHA -> linear -> residual + LayerNorm (rpe_transformer.py:78-105)."""

    d_model: int
    num_heads: int
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_weights=None,
                 memory_masks=None, attention_factors=None, deterministic: bool = True):
        hidden, scores = RPEMultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                               name="attention")(
            input_states, memory_states, memory_states, position_states,
            key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors,
            deterministic=deterministic)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        if self.dropout:
            hidden = nn.Dropout(self.dropout, name="dropout")(hidden, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(hidden + input_states), scores


class TransformerLayer(nn.Module):
    """AttentionLayer + FFN output block (vanilla_transformer.py:116-146)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, memory_states, memory_weights=None, memory_masks=None,
                 attention_factors=None, deterministic: bool = True):
        hidden, scores = AttentionLayer(self.d_model, self.num_heads, self.dropout,
                                        name="attention")(
            input_states, memory_states, memory_weights=memory_weights, memory_masks=memory_masks,
            attention_factors=attention_factors, deterministic=deterministic)
        return AttentionOutput(self.d_model, self.activation_fn, self.dropout,
                               name="output")(hidden, deterministic=deterministic), scores


class RPETransformerLayer(nn.Module):
    """RPEAttentionLayer + FFN output block (rpe_transformer.py:108-131)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_weights=None,
                 memory_masks=None, attention_factors=None, deterministic: bool = True):
        hidden, scores = RPEAttentionLayer(self.d_model, self.num_heads, self.dropout,
                                           name="attention")(
            input_states, memory_states, position_states, memory_weights=memory_weights,
            memory_masks=memory_masks, attention_factors=attention_factors,
            deterministic=deterministic)
        return AttentionOutput(self.d_model, self.activation_fn, self.dropout,
                               name="output")(hidden, deterministic=deterministic), scores


class PETransformerLayer(nn.Module):
    """Absolute-PE self-attention layer + FFN (pe_transformer.py:75-132)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_position_states,
                 memory_weights=None, memory_masks=None, attention_factors=None,
                 deterministic: bool = True):
        hidden, scores = PEMultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                              name="attention")(
            input_states, memory_states, memory_states, position_states, memory_position_states,
            key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors,
            deterministic=deterministic)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        if self.dropout:
            hidden = nn.Dropout(self.dropout, name="dropout")(hidden, deterministic=deterministic)
        hidden = nn.LayerNorm(name="norm")(hidden + input_states)
        return AttentionOutput(self.d_model, self.activation_fn, self.dropout,
                               name="output")(hidden, deterministic=deterministic), scores


class TransformerEncoderLayer(nn.Module):
    """Self-attention encoder layer (vanilla_transformer.py:149-171)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, feats, masks=None, deterministic: bool = True):
        out, _ = TransformerLayer(self.d_model, self.num_heads, self.activation_fn, self.dropout,
                                  name="layer")(
            feats, feats, memory_masks=masks, deterministic=deterministic)
        return out


class TransformerDecoderLayer(nn.Module):
    """Self + cross attention decoder layer (vanilla_transformer.py:160-183)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, q_feats, s_feats, q_masks=None, s_masks=None, deterministic: bool = True):
        q_feats, _ = TransformerLayer(self.d_model, self.num_heads, self.activation_fn, self.dropout,
                                      name="self_attention")(q_feats, q_feats, memory_masks=q_masks,
                                                             deterministic=deterministic)
        q_feats, _ = TransformerLayer(self.d_model, self.num_heads, self.activation_fn, self.dropout,
                                      name="cross_attention")(q_feats, s_feats, memory_masks=s_masks,
                                                              deterministic=deterministic)
        return q_feats


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (vanilla_transformer.py:186-193)."""

    num_layers: int
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, feats, masks=None, deterministic: bool = True):
        for i in range(self.num_layers):
            feats = TransformerEncoderLayer(self.d_model, self.num_heads, self.activation_fn,
                                            self.dropout, name=f"layers_{i}")(
                feats, masks, deterministic=deterministic)
        return feats


class TransformerDecoder(nn.Module):
    """Stack of decoder layers (vanilla_transformer.py:196-201)."""

    num_layers: int
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, q_feats, s_feats, q_masks=None, s_masks=None, deterministic: bool = True):
        for i in range(self.num_layers):
            q_feats = TransformerDecoderLayer(self.d_model, self.num_heads, self.activation_fn,
                                              self.dropout, name=f"layers_{i}")(
                q_feats, s_feats, q_masks, s_masks, deterministic=deterministic)
        return q_feats


class RPEConditionalTransformer(nn.Module):
    """Interleaved self (RPE w/ geometric embedding) and cross (vanilla)
    blocks over the two clouds (conditional_transformer.py:73-117)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    parallel: bool = False
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None, masks1=None,
                 deterministic: bool = True):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                            self.dropout, name=f"layers_{i}")
                feats0, _ = layer(feats0, feats0, embeddings0, memory_masks=masks0,
                                  deterministic=deterministic)
                feats1, _ = layer(feats1, feats1, embeddings1, memory_masks=masks1,
                                  deterministic=deterministic)
            elif block == "cross":
                layer = TransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                         self.dropout, name=f"layers_{i}")
                new_feats0, _ = layer(feats0, feats1, memory_masks=masks1,
                                      deterministic=deterministic)
                if self.parallel:
                    new_feats1, _ = layer(feats1, feats0, memory_masks=masks0,
                                          deterministic=deterministic)
                else:
                    new_feats1, _ = layer(feats1, new_feats0, memory_masks=masks0,
                                          deterministic=deterministic)
                feats0, feats1 = new_feats0, new_feats1
            else:
                raise ValueError(f'Unsupported block type "{block}".')
        return feats0, feats1


class PEConditionalTransformer(nn.Module):
    """Self blocks with absolute PE, cross blocks vanilla
    (conditional_transformer.py:42-70)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = PETransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                           name=f"layers_{i}")
                feats0, _ = layer(feats0, feats0, embeddings0, embeddings0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, embeddings1, embeddings1, memory_masks=masks1)
            else:
                layer = TransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                         name=f"layers_{i}")
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
        return feats0, feats1


class LRPEConditionalTransformer(nn.Module):
    """Self blocks with learnable relative PE over quantized indices, cross
    vanilla (conditional_transformer.py:120-161, lrpe_transformer.py:19-148).
    `emb_indices` are integer relative-position bins (B, N, N)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    num_embeddings: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, emb_indices0, emb_indices1, masks0=None, masks1=None):
        from ref_geotransformer_tpu.models.embedding import LearnablePositionalEmbedding

        embed = LearnablePositionalEmbedding(self.num_embeddings, self.d_model, name="embedding")
        e0 = embed(emb_indices0)
        e1 = embed(emb_indices1)
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                            name=f"layers_{i}")
                feats0, _ = layer(feats0, feats0, e0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, e1, memory_masks=masks1)
            else:
                layer = TransformerLayer(self.d_model, self.num_heads, self.activation_fn,
                                         name=f"layers_{i}")
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
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
