"""Iteration-based trainers (fork additions) + warmup-cosine schedule.

Ref parity: engine/iter_based_trainer.py:19-391 and utils/torch.py:153-178 —
  * `make_warmup_cosine_schedule`: LR factor warms linearly from eta_init to
    1 over warmup_steps then cosine-anneals to eta_min.
  * `IterBasedEncoderTrainer`: iteration-based loop with snapshot +
    truncated validation every snapshot_steps (used for the LineMod encoder).
  * `IterBasedDDPMTrainer`: two-model loop — a FROZEN GeoTransformer encoder
    produces latent dicts per pair which feed Cordi's DDPM epsilon-loss; val
    runs encoder -> Cordi.sample -> DDPMEvaluator.
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
from ref_geotransformer_tpu.engine.state import TrainState, guard_nonfinite
from ref_geotransformer_tpu.engine.steps import ensure_pyramids
from ref_geotransformer_tpu.models.cordi import cordi_downsample, get_corr_from_matrix_topk
from ref_geotransformer_tpu.utils.common import get_log_string
from ref_geotransformer_tpu.utils.logger import Logger
from ref_geotransformer_tpu.utils.summary_board import SummaryBoard
from ref_geotransformer_tpu.utils.timer import Timer


def make_warmup_cosine_schedule(
    lr: float, total_steps: int, warmup_steps: int, eta_init: float = 0.1, eta_min: float = 0.1
):
    """utils/torch.py:153-170 parity (factor relative to base lr)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = eta_init + (1.0 - eta_init) / warmup_steps * step
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = eta_min + 0.5 * (1.0 - eta_min) * (1.0 + jnp.cos(jnp.pi * t))
        return lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def cycle(loader: Iterable):
    """Infinite dataloader (engine/iter_based_trainer.py:19-38)."""
    while True:
        yield from loader


class IterBasedEncoderTrainer:
    """Iteration-based GeoTransformer training (iter_based_trainer.py:41-210)."""

    def __init__(
        self,
        cfg,
        model,
        state: TrainState,
        lr_schedule,
        train_loader,
        val_loader=None,
        train_step: Optional[Callable] = None,
        eval_step: Optional[Callable] = None,
        max_iteration: int = 100000,
        snapshot_steps: int = 2000,
        val_iters: int = 100,
        snapshot_dir: str = "snapshots/encoder",
        log_file: Optional[str] = None,
        log_steps: int = 10,
        seed: int = 7351,
        corr_dump_dir: Optional[str] = None,
    ):
        from ref_geotransformer_tpu.engine.steps import make_eval_step, make_train_step

        self.cfg = cfg
        self.model = model
        self.state = state
        self.lr_schedule = lr_schedule
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.max_iteration = max_iteration
        self.snapshot_steps = snapshot_steps
        self.val_iters = val_iters
        self.log_steps = log_steps
        self.iteration = 0
        from ref_geotransformer_tpu.parallel.multihost import is_primary

        # process-0 gate for host side effects (reference rank-0 semantics)
        self.primary = is_primary()
        self.logger = Logger(
            log_file=log_file if self.primary else None,
            local_rank=0 if self.primary else 1,
        )
        self.summary_board = SummaryBoard(last_n=log_steps, adaptive=True)
        self.timer = Timer()
        self.ckpt = CheckpointManager(snapshot_dir)
        self.rng = jax.random.key(seed)
        self.train_step = train_step or make_train_step(model, cfg)
        self.eval_step = eval_step or make_eval_step(model, cfg)
        # val-time correspondence PLY dumps (ref parity:
        # iter_based_trainer.py:137-140 `save_corr_pcd`); opt-in via dir
        self.corr_dump_dir = corr_dump_dir
        self._corr_forward = None

    def _dump_corr_pcd(self, batch) -> None:
        from ref_geotransformer_tpu.engine.steps import make_forward_fn
        from ref_geotransformer_tpu.utils.visualization import save_corr_pcd

        if self._corr_forward is None:
            self._corr_forward = make_forward_fn(self.model, self.cfg)
        pair = {
            k: v[0] for k, v in batch.items() if k != "_pair_masks"
        }  # first pair of the batch
        output = jax.device_get(self._corr_forward(self.state.params, self.state.buffers, pair))
        ir = save_corr_pcd(output, self.corr_dump_dir, prefix=f"iter{self.iteration}-")
        self.logger.info(f"[Val] saved correspondence PLYs (coarse IR {ir:.3f}) to {self.corr_dump_dir}")

    def validate(self) -> Dict:
        if self.val_loader is None:
            return {}
        board = SummaryBoard(adaptive=True)
        for i, batch in enumerate(itertools.islice(iter(self.val_loader), self.val_iters)):
            metrics = jax.device_get(self.eval_step(self.state, batch))
            board.update_from_result_dict(metrics)
            if i == 0 and self.corr_dump_dir is not None:
                self._dump_corr_pcd(batch)
        summary = board.summary()
        self.logger.info("[Val] " + get_log_string(summary, iteration=self.iteration))
        return summary

    def run(self, resume: bool = False) -> None:
        if resume and self.ckpt.has_snapshot():
            self.state, _, self.iteration = self.ckpt.load_snapshot(self.state)
            self.logger.info(f"Resumed at iteration {self.iteration}.")
        stream = cycle(self.train_loader)
        self.timer.record()
        while self.iteration < self.max_iteration:
            batch = next(stream)
            self.timer.add_prepare_time()
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, losses = self.train_step(self.state, batch, step_rng)
            losses = jax.device_get(losses)
            self.timer.add_process_time()
            self.iteration += 1
            self.summary_board.update_from_result_dict(losses)
            if self.iteration % self.log_steps == 0:
                lr = float(self.lr_schedule(int(self.state.step)))
                self.logger.info(
                    get_log_string(
                        self.summary_board.summary(),
                        iteration=self.iteration,
                        max_iteration=self.max_iteration,
                        lr=lr,
                        timer=self.timer,
                    )
                )
            if self.iteration % self.snapshot_steps == 0:
                if self.primary:
                    self.ckpt.save_epoch(f"iter-{self.iteration}", self.state.params, self.state.buffers)
                    self.ckpt.save_snapshot(self.state, 0, self.iteration)
                self.validate()
            self.timer.record()


class IterBasedDDPMTrainer:
    """Frozen-encoder + Cordi DDPM training loop (iter_based_trainer.py:213-391).

    Per iteration: run the frozen encoder on `ddpm_batch_size` pairs, build
    the sampled correspondence-matrix batch (cordi_downsample), and take one
    diffusion step on the epsilon-loss.
    """

    def __init__(
        self,
        cfg,
        encoder_model,
        encoder_params,
        encoder_buffers,
        cordi_model,
        cordi_state: TrainState,
        lr_schedule,
        train_loader,
        val_loader=None,
        max_iteration: int = 100000,
        snapshot_steps: int = 2000,
        val_iters: int = 20,
        ddpm_batch_size: int = 1,
        snapshot_dir: str = "snapshots/ddpm",
        log_file: Optional[str] = None,
        log_steps: int = 10,
        seed: int = 7351,
    ):
        self.cfg = cfg
        self.cordi_model = cordi_model
        self.state = cordi_state
        self.lr_schedule = lr_schedule
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.max_iteration = max_iteration
        self.snapshot_steps = snapshot_steps
        self.val_iters = val_iters
        self.ddpm_batch_size = ddpm_batch_size
        self.log_steps = log_steps
        self.iteration = 0
        from ref_geotransformer_tpu.parallel.multihost import is_primary

        # process-0 gate for host side effects (reference rank-0 semantics)
        self.primary = is_primary()
        self.logger = Logger(
            log_file=log_file if self.primary else None,
            local_rank=0 if self.primary else 1,
        )
        self.summary_board = SummaryBoard(last_n=log_steps, adaptive=True)
        self.timer = Timer()
        self.ckpt = CheckpointManager(snapshot_dir)
        self.rng = jax.random.key(seed)

        r = cordi_model.ref_sample_num
        s = cordi_model.src_sample_num

        @jax.jit
        def encode_and_downsample(pair, rng):
            data = ensure_pyramids(cfg, pair)
            out = encoder_model.apply(
                {"params": encoder_params, "buffers": encoder_buffers}, data, training=False
            )
            d = cordi_downsample(rng, out, r, s)
            return d

        @jax.jit
        def ddpm_step(state, x0, ctx, rng):
            def loss_fn(params):
                return cordi_model.apply(
                    {"params": params}, x0, ctx, rng, method=type(cordi_model).get_loss
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        @jax.jit
        def ddpm_sample(state, x_t, ctx, rng):
            return cordi_model.apply({"params": state.params}, x_t, ctx, rng, method=type(cordi_model).sample)

        self._encode = encode_and_downsample
        self._step = ddpm_step
        self._sample = ddpm_sample

    def _latent_batch(self, stream):
        ds = []
        for _ in range(self.ddpm_batch_size):
            batch = next(stream)
            pair = jax.tree_util.tree_map(lambda x: x[0], batch)
            self.rng, d_rng = jax.random.split(self.rng)
            ds.append(self._encode(pair, d_rng))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *ds)

    def validate(self) -> Dict:
        """Encoder -> Cordi.sample -> DDPM evaluator (PIR@topk, IIR)."""
        if self.val_loader is None:
            return {}
        board = SummaryBoard(adaptive=True)
        stream = iter(self.val_loader)
        for _ in range(self.val_iters):
            try:
                batch = next(stream)
            except StopIteration:
                break
            pair = jax.tree_util.tree_map(lambda x: x[0], batch)
            self.rng, d_rng, s_rng = jax.random.split(self.rng, 3)
            d = self._encode(pair, d_rng)
            pred = self._sample(self.state, d["init_corr_matrix"][None], d["feat_matrix"][None], s_rng)
            metrics = evaluate_ddpm(
                np.asarray(pred[0]),
                np.asarray(d["gt_corr_matrix"]),
                np.asarray(d["init_corr_matrix"]),
            )
            board.update_from_result_dict(metrics)
        summary = board.summary()
        self.logger.info("[Val] " + get_log_string(summary, iteration=self.iteration))
        return summary

    def run(self, resume: bool = False) -> None:
        if resume and self.ckpt.has_snapshot():
            self.state, _, self.iteration = self.ckpt.load_snapshot(self.state)
            self.logger.info(f"Resumed at iteration {self.iteration}.")
        stream = cycle(self.train_loader)
        self.timer.record()
        while self.iteration < self.max_iteration:
            latents = self._latent_batch(stream)
            self.timer.add_prepare_time()
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, loss = self._step(
                self.state, latents["gt_corr_matrix"], latents["feat_matrix"], step_rng
            )
            self.timer.add_process_time()
            self.iteration += 1
            self.summary_board.update_from_result_dict({"loss": float(loss)})
            if self.iteration % self.log_steps == 0:
                lr = float(self.lr_schedule(int(self.state.step)))
                self.logger.info(
                    get_log_string(
                        self.summary_board.summary(),
                        iteration=self.iteration,
                        max_iteration=self.max_iteration,
                        lr=lr,
                        timer=self.timer,
                    )
                )
            if self.iteration % self.snapshot_steps == 0:
                if self.primary:
                    self.ckpt.save_epoch(f"iter-{self.iteration}", self.state.params, self.state.buffers)
                    self.ckpt.save_snapshot(self.state, 0, self.iteration)
                self.validate()
            self.timer.record()


def evaluate_ddpm(pred_corr_mat: np.ndarray, gt_corr_matrix: np.ndarray, init_corr_matrix: np.ndarray) -> Dict:
    """DDPMEvaluator parity (modelnet experiment loss.py:161-234): PIR at
    top-32/16/8 of the predicted matrix + init-correspondence inlier ratio."""
    gt01 = (gt_corr_matrix + 1.0) / 2.0

    def pir(k):
        r, s = pred_corr_mat.shape
        flat = pred_corr_mat.reshape(-1)
        idx = np.argpartition(-flat, min(k, flat.size) - 1)[:k]
        return float(gt01[idx // s, idx % s].mean())

    init_i, init_j = np.nonzero(init_corr_matrix == 1.0)
    iir = float(gt01[init_i, init_j].mean()) if init_i.size else 0.0
    return {"PIR": pir(32), "PIR_0.5": pir(16), "PIR_0.25": pir(8), "IIR": iir}
