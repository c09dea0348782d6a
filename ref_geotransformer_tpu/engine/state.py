"""Train state + optimizer/schedule factories.

Ref parity: the reference registers Adam(lr, weight_decay) + StepLR
(experiments/.../trainval.py:31-34) and scales LR by world size
(engine/base_trainer.py:210-215). Here: optax adamw + exponential staircase
decay; `lr_scale` carries the world-size rule (replicas == data-axis size).
The reference's NaN/Inf gradient check (base_trainer.py:240-248) maps to
`skip_nonfinite_updates`, which zeroes the update when any grad is
non-finite instead of dropping into ipdb.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ref_geotransformer_tpu.config import OptimConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int, lr_scale: float = 1.0):
    """StepLR(gamma=lr_decay every lr_decay_steps epochs) as an optax schedule."""
    return optax.exponential_decay(
        init_value=cfg.lr * lr_scale,
        transition_steps=max(1, cfg.lr_decay_steps * steps_per_epoch),
        decay_rate=cfg.lr_decay,
        staircase=True,
    )


def skip_nonfinite_updates() -> optax.GradientTransformation:
    """Zero the whole update when any gradient entry is non-finite."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        flat = jax.tree_util.tree_leaves(updates)
        finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in flat]))
        updates = jax.tree_util.tree_map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, lr_scale: float = 1.0):
    schedule = make_lr_schedule(cfg, steps_per_epoch, lr_scale)
    tx = optax.chain(
        skip_nonfinite_updates(),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    if cfg.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_acc_steps)
    return tx, schedule


def create_train_state(
    model,
    example_data,
    optim_cfg: OptimConfig,
    steps_per_epoch: int,
    rng: Optional[jax.Array] = None,
    lr_scale: float = 1.0,
):
    """Initialize params/buffers and wrap with the optimizer."""
    if rng is None:
        rng = jax.random.key(0)
    p_rng, t_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "target": t_rng}, example_data)
    tx, schedule = make_optimizer(optim_cfg, steps_per_epoch, lr_scale)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    return state, schedule
