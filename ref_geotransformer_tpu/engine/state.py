"""Train state + optimizer/schedule factories.

Ref parity: the reference registers Adam(lr, weight_decay) + StepLR
(experiments/.../trainval.py:31-34) and scales LR by world size
(engine/base_trainer.py:210-215). Here: optax adam with coupled L2 decay
(add_decayed_weights before adam — exactly torch Adam's weight_decay) +
exponential staircase decay; `lr_scale` carries the world-size rule
(replicas == data-axis size). The reference's NaN/Inf gradient check
(base_trainer.py:240-248) maps to `guard_nonfinite` (optax.apply_if_finite):
the whole step is skipped, params and moments untouched, instead of dropping
into ipdb.
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


def guard_nonfinite(tx: optax.GradientTransformation, max_consecutive_errors: int = 1000):
    """Skip the WHOLE optimizer step (params and moments untouched) when any
    gradient is non-finite — the reference's NaN-grad step skipping
    (base_trainer.py:240-248) without the ipdb drop."""
    return optax.apply_if_finite(tx, max_consecutive_errors=max_consecutive_errors)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, lr_scale: float = 1.0):
    schedule = make_lr_schedule(cfg, steps_per_epoch, lr_scale)
    # Faithful port of torch.optim.Adam(lr, weight_decay): L2 decay is added
    # to the GRADIENT before Adam's moment normalization (coupled decay), not
    # AdamW's decoupled decay. apply_if_finite skips the WHOLE step (params
    # and moments untouched) on non-finite gradients — the reference's
    # NaN-grad step skipping.
    tx = optax.apply_if_finite(
        optax.chain(optax.add_decayed_weights(cfg.weight_decay), optax.adam(schedule)),
        max_consecutive_errors=1000,
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
