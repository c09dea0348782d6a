"""Jitted train / eval step factories (single-pair and batched/DP).

The reference runs one pair per GPU per step (README.md:174-182, a hard
limitation of its variable-shape "pack mode"). Static shapes lift that
restriction: a batch of pairs is just a leading vmap axis, and data
parallelism shards that axis over the mesh inside one jit — gradients are
globally averaged by construction (the SPMD partitioner inserts the
reduction, replacing DDP's bucket all-reduce).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ref_geotransformer_tpu.config import GeoTransformerConfig
from ref_geotransformer_tpu.data.pyramid import build_registration_inputs
from ref_geotransformer_tpu.models.losses import evaluate, overall_loss


def ensure_pyramids(cfg: GeoTransformerConfig, pair: Dict) -> Dict:
    """If `pair` is a raw padded pair (from data.loader), build the
    multi-resolution pyramid on device; pass prebuilt inputs through."""
    if "ref" in pair:
        return pair
    return build_registration_inputs(
        pair["ref_points"],
        pair["ref_masks"],
        pair["src_points"],
        pair["src_masks"],
        cfg.backbone.num_stages,
        cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius,
        cfg.capacities.neighbor_limits,
        cfg.capacities.points,
        transform=pair.get("transform"),
        search_chunk=cfg.capacities.search_chunk,
    )


def make_train_step(
    model,
    cfg: GeoTransformerConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `batch` is a pytree of arrays with a leading batch axis (use
    tests/utils-style builders or the datasets' collate). With a mesh, the
    batch axis is sharded over 'data' and params are replicated.
    """

    def loss_for_pair(params, buffers, pair, rng):
        data = ensure_pyramids(cfg, pair)
        out = model.apply(
            {"params": params, "buffers": buffers}, data, training=True, rngs={"target": rng}
        )
        losses = overall_loss(out, data["transform"], cfg.coarse_loss, cfg.fine_loss, cfg.loss)
        return losses

    def step(state, batch, rng):
        batch = dict(batch)
        pair_masks = batch.pop("_pair_masks", None)  # repeat-padded final batches
        batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
        rngs = jax.random.split(rng, batch_size)

        def mean_loss(params):
            losses = jax.vmap(lambda d, r: loss_for_pair(params, state.buffers, d, r))(batch, rngs)
            if pair_masks is not None:
                w = pair_masks.astype(jnp.float32)
                denom = jnp.maximum(jnp.sum(w), 1.0)
                losses = jax.tree_util.tree_map(lambda x: jnp.sum(x * w) / denom, losses)
            else:
                losses = jax.tree_util.tree_map(jnp.mean, losses)
            return losses["loss"], losses

        grads, losses = jax.grad(mean_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, cfg: GeoTransformerConfig, mesh: Optional[Mesh] = None) -> Callable:
    """Returns eval_step(state, batch) -> metric dict (per-batch means)."""

    def eval_pair(params, buffers, pair):
        data = ensure_pyramids(cfg, pair)
        out = model.apply({"params": params, "buffers": buffers}, data, training=False)
        metrics = evaluate(out, data["transform"], cfg.eval)
        losses = overall_loss(out, data["transform"], cfg.coarse_loss, cfg.fine_loss, cfg.loss)
        return {**losses, **metrics}

    def step(state, batch):
        batch = dict(batch)
        pair_masks = batch.pop("_pair_masks", None)
        metrics = jax.vmap(lambda d: eval_pair(state.params, state.buffers, d))(batch)
        if pair_masks is not None:
            w = pair_masks.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            return jax.tree_util.tree_map(lambda x: jnp.sum(x * w) / denom, metrics)
        return jax.tree_util.tree_map(jnp.mean, metrics)

    if mesh is None:
        return jax.jit(step)

    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(repl, batch_sh), out_shardings=repl)


def make_forward_fn(model, cfg: Optional[GeoTransformerConfig] = None) -> Callable:
    """Plain jitted single-pair forward (inference path). With `cfg`, raw
    padded pairs are accepted and the pyramid is built in-graph."""

    @jax.jit
    def forward(params, buffers, pair):
        data = ensure_pyramids(cfg, pair) if cfg is not None else pair
        return model.apply({"params": params, "buffers": buffers}, data, training=False)

    return forward
