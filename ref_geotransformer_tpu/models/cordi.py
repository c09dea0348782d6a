"""Cordi: correspondence diffusion (DDPM over superpoint correspondence
matrices) — the Ref-GeoTransformer fork's research addition.

Ref parity: modules/cordi/cordi.py:8-165, ddpm.py:13-154, transformer.py:5-47
and config (modelnet config.py:149-159). Key reformulations:

  * `downsample` — the reference builds the sampled GT/init correspondence
    matrices with O(40x80) Python set-intersection loops on the host
    (cordi.py:69-104); here it is one-hot membership lookups into the dense
    (M, N) maps, fully vectorized and jit-safe.
  * the denoiser runs attention over the full 40x80(+1 time token) cell
    sequence. (The torch reference feeds (B, S, E) tensors to pre-batch_first
    nn.TransformerEncoder which treats dim 0 as the sequence, so its
    attention degenerates to sequence length B=1; we implement the intended
    semantics.)
  * the reverse-diffusion loop is a lax.scan over the precomputed variance
    schedule (ddpm.py:127-154), entirely on device.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class VarianceSchedule:
    """Linear beta schedule with zero-padded step 0 (ddpm.py:13-53).

    Precomputed as numpy constants; arrays are closed over by jitted fns.
    """

    def __init__(self, num_steps: int, beta_1: float, beta_T: float, mode: str = "linear"):
        assert mode == "linear"
        self.num_steps = num_steps
        betas = np.concatenate([[0.0], np.linspace(beta_1, beta_T, num_steps)]).astype(np.float32)
        alphas = 1.0 - betas
        alpha_bars = np.exp(np.cumsum(np.log(alphas)))
        sigmas_flex = np.sqrt(betas)
        sigmas_inflex = np.zeros_like(sigmas_flex)
        sigmas_inflex[1:] = np.sqrt(
            ((1.0 - alpha_bars[:-1]) / (1.0 - alpha_bars[1:])) * betas[1:]
        )
        self.betas = jnp.asarray(betas)
        self.alphas = jnp.asarray(alphas)
        self.alpha_bars = jnp.asarray(alpha_bars)
        self.sigmas_flex = jnp.asarray(sigmas_flex)
        self.sigmas_inflex = jnp.asarray(sigmas_inflex)

    def get_sigmas(self, t: jnp.ndarray, flexibility: float = 0.0) -> jnp.ndarray:
        return self.sigmas_flex[t] * flexibility + self.sigmas_inflex[t] * (1.0 - flexibility)


def ddpm_loss(var_sched: VarianceSchedule, net_fn, x_0: jnp.ndarray,
              t: jnp.ndarray, e_rand: jnp.ndarray) -> jnp.ndarray:
    """Epsilon-prediction MSE at explicit (t, e_rand) (ddpm.py:80-110):
    e_theta = net(sqrt(a_bar_t) x_0 + sqrt(1-a_bar_t) e, t), loss = mse(e_theta, e).

    Pure in its noise arguments so cross-implementation parity can pin them
    (tests/test_cordi_ddpm_parity.py); Cordi.get_loss draws them from a PRNG
    key and delegates here."""
    alpha_bar = var_sched.alpha_bars[t]
    c0 = jnp.sqrt(alpha_bar)[:, None, None]
    c1 = jnp.sqrt(1.0 - alpha_bar)[:, None, None]
    e_theta = net_fn(c0 * x_0 + c1 * e_rand, t)
    return jnp.mean((e_theta - e_rand) ** 2)


def ddpm_sample(var_sched: VarianceSchedule, net_fn, x_T: jnp.ndarray,
                zs: jnp.ndarray, flexibility: float = 0.0) -> jnp.ndarray:
    """Reverse diffusion t = num_steps..1 (ddpm.py:127-154) as a lax.scan;
    `zs` is the (num_steps, ...) noise sequence indexed zs[0] at t=num_steps
    (the t=1 entry is overridden to zero, matching the reference)."""

    def body(x_t, inp):
        t, z = inp
        z = jnp.where(t > 1, z, jnp.zeros_like(z))
        alpha = var_sched.alphas[t]
        alpha_bar = var_sched.alpha_bars[t]
        sigma = var_sched.get_sigmas(t, flexibility)
        c0 = 1.0 / jnp.sqrt(alpha)
        c1 = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)
        e_theta = net_fn(x_t, t)
        x_next = c0 * (x_t - c1 * e_theta) + sigma * z
        return x_next, None

    ts = jnp.arange(var_sched.num_steps, 0, -1)
    x_0, _ = jax.lax.scan(body, x_T, (ts, zs))
    return x_0


class SinusoidalTimeEmbedding(nn.Module):
    """Timestep embedding (ddpm.py:56-69)."""

    dim: int

    @nn.compact
    def __call__(self, time: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
        args = time.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class _EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch TransformerEncoderLayer
    semantics: attn -> add&norm -> FFN -> add&norm)."""

    d_model: int
    num_heads: int
    ffn_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, qkv_features=self.d_model,
                                               name="self_attn")(x, x)
        x = nn.LayerNorm(name="norm1")(x + attn)
        act = {"gelu": nn.gelu, "relu": nn.relu}[self.activation]
        h = nn.Dense(self.ffn_dim, name="linear1")(x)
        h = nn.Dense(self.d_model, name="linear2")(act(h))
        return nn.LayerNorm(name="norm2")(x + h)


class DenoisingTransformer(nn.Module):
    """epsilon-predictor over the flattened correspondence-matrix sequence
    (transformer.py:5-47): tokens = x_t[i,j] + ctx[i,j] plus one time token;
    output MLP d_model -> 64 -> 32 -> 1 per cell."""

    n_layers: int = 8
    n_heads: int = 8
    query_dimensions: int = 64
    feed_forward_dimensions: int = 2048
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, t_emb: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
        """x_t: (B, R, S); t_emb: (B, D); ctx: (B, R, S, D) -> eps: (B, R, S)."""
        b, r, s = x_t.shape
        d = self.n_heads * self.query_dimensions
        assert ctx.shape[-1] == d, (
            f"context width {ctx.shape[-1]} must equal the denoiser d_model "
            f"{d} (= n_heads * query_dimensions; the encoder context is "
            f"2 * coarse output_dim)"
        )
        tokens = x_t[..., None] + ctx  # (B, R, S, D)
        tokens = tokens.reshape(b, r * s, d)
        tokens = jnp.concatenate([tokens, t_emb[:, None, :]], axis=1)  # (B, R*S+1, D)
        for i in range(self.n_layers):
            tokens = _EncoderLayer(d, self.n_heads, self.feed_forward_dimensions,
                                   self.activation, name=f"layers_{i}")(tokens)
        out = nn.LayerNorm(name="out_norm")(tokens)
        out = nn.Dense(64, name="out_fc1")(out)
        out = nn.Dense(32, name="out_fc2")(nn.relu(out))
        out = nn.Dense(1, name="out_fc3")(nn.relu(out))
        out = out[:, :-1, 0]  # drop time token
        return out.reshape(b, r, s)


class Cordi(nn.Module):
    """Diffusion wrapper over frozen GeoTransformer coarse outputs
    (cordi.py:8-165)."""

    ref_sample_num: int = 40
    src_sample_num: int = 80
    num_steps: int = 100
    beta_1: float = 1e-4
    beta_T: float = 0.02
    time_emb_dim: int = 512
    n_layers: int = 8
    n_heads: int = 8
    query_dimensions: int = 64
    feed_forward_dimensions: int = 2048
    activation: str = "gelu"

    def setup(self):
        self.var_sched = VarianceSchedule(self.num_steps, self.beta_1, self.beta_T)
        self.net = DenoisingTransformer(
            self.n_layers, self.n_heads, self.query_dimensions,
            self.feed_forward_dimensions, self.activation, name="net",
        )
        d_model = self.n_heads * self.query_dimensions
        self.time_mlp = nn.Dense(d_model, name="time_mlp")
        self.time_embed = SinusoidalTimeEmbedding(self.time_emb_dim, name="time_embed")

    def _time_token(self, t: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(self.time_mlp(self.time_embed(t)))

    def get_loss(self, x_0: jnp.ndarray, ctx: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """DDPM epsilon-loss (ddpm.py:80-110): t ~ U[0, num_steps), closed
        form q(x_t | x_0), MSE between predicted and true noise."""
        b = x_0.shape[0]
        t_rng, e_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, self.num_steps)
        e_rand = jax.random.normal(e_rng, x_0.shape)
        net_fn = lambda x, tt: self.net(x, self._time_token(tt), ctx)
        return ddpm_loss(self.var_sched, net_fn, x_0, t, e_rand)

    def sample(self, x_T: jnp.ndarray, ctx: jnp.ndarray, rng: jax.Array,
               flexibility: float = 0.0) -> jnp.ndarray:
        """Reverse diffusion from the init corr matrix (ddpm.py:127-154) as a
        lax.scan from t = num_steps down to 1."""
        b = x_T.shape[0]
        zs = jax.random.normal(rng, (self.num_steps,) + x_T.shape)
        net_fn = lambda x, t: self.net(x, self._time_token(jnp.full((b,), t, jnp.int32)), ctx)
        return ddpm_sample(self.var_sched, net_fn, x_T, zs, flexibility)

    def __call__(self, x_0: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
        """Init path: one denoiser application (for parameter shapes)."""
        t = jnp.zeros((x_0.shape[0],), jnp.int32)
        return self.net(x_0, self._time_token(t), ctx)


def cordi_downsample(
    rng: jax.Array,
    output: Dict,
    ref_sample_num: int,
    src_sample_num: int,
) -> Dict:
    """Vectorized replacement for Cordi.downsample (cordi.py:40-128).

    Consumes one encoder output dict (dense GT overlap map + coarse proposal
    indices) and emits the (R, S) +-1 GT / init correspondence matrices, the
    (R, S, 2C) concatenated feature context, and the sampled points.
    """
    ref_rng, src_rng = jax.random.split(rng)
    ref_masks = output["ref_node_masks"]
    src_masks = output["src_node_masks"]
    m, n = ref_masks.shape[0], src_masks.shape[0]

    # random sample of valid nodes without replacement (top-k of random keys)
    ref_keys = jnp.where(ref_masks, jax.random.uniform(ref_rng, (m,)), -1.0)
    src_keys = jnp.where(src_masks, jax.random.uniform(src_rng, (n,)), -1.0)
    _, ref_idx = jax.lax.top_k(ref_keys, ref_sample_num)
    _, src_idx = jax.lax.top_k(src_keys, src_sample_num)

    gt_map = output["gt_node_overlap_map"] > 0.0  # (M, N)
    gt_corr_matrix = jnp.where(gt_map[ref_idx][:, src_idx], 1.0, -1.0)

    init_map = jnp.zeros((m, n), bool)
    init_map = init_map.at[output["ref_node_corr_indices"], output["src_node_corr_indices"]].set(True)
    init_corr_matrix = jnp.where(init_map[ref_idx][:, src_idx], 1.0, -1.0)

    ref_feats = output["ref_feats_c"][ref_idx]  # (R, C)
    src_feats = output["src_feats_c"][src_idx]  # (S, C)
    feat_matrix = jnp.concatenate(
        [
            jnp.broadcast_to(ref_feats[:, None, :], (ref_sample_num, src_sample_num, ref_feats.shape[1])),
            jnp.broadcast_to(src_feats[None, :, :], (ref_sample_num, src_sample_num, src_feats.shape[1])),
        ],
        axis=-1,
    )
    return {
        "ref_points": output["ref_points_c"][ref_idx],
        "src_points": output["src_points_c"][src_idx],
        "ref_feats": ref_feats,
        "src_feats": src_feats,
        "gt_corr_matrix": gt_corr_matrix,
        "init_corr_matrix": init_corr_matrix,
        "feat_matrix": feat_matrix,
    }


def get_corr_from_matrix_topk(corr_matrix: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cells of a (R, S) correspondence matrix -> (k,) ref idx, (k,)
    src idx (bop_utils.py:238-249)."""
    r, s = corr_matrix.shape[-2:]
    flat = corr_matrix.reshape(corr_matrix.shape[:-2] + (r * s,))
    _, idx = jax.lax.top_k(flat, k)
    return (idx // s).astype(jnp.int32), (idx % s).astype(jnp.int32)
