"""Single-pair tester (ref parity: engine/base_tester.py:24-85 +
single_tester.py:14-74): resolve a snapshot, loop the test set, collect
metrics, and hand each pair's outputs to a callback (the experiment's
after_test_step, e.g. the .npz feature dump for offline eval)."""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax

from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
from ref_geotransformer_tpu.engine.steps import make_forward_fn
from ref_geotransformer_tpu.models.losses import evaluate
from ref_geotransformer_tpu.utils.common import get_log_string
from ref_geotransformer_tpu.utils.logger import Logger
from ref_geotransformer_tpu.utils.summary_board import SummaryBoard
from ref_geotransformer_tpu.utils.timer import Timer


class SingleTester:
    def __init__(
        self,
        cfg,
        model,
        params,
        buffers,
        test_loader: Iterable,
        after_test_step: Optional[Callable] = None,
        log_file: Optional[str] = None,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.buffers = buffers
        self.test_loader = test_loader
        self.after_test_step = after_test_step
        self.logger = Logger(log_file=log_file)
        self.forward = make_forward_fn(model, cfg)

    @classmethod
    def from_snapshot(cls, cfg, model, state, snapshot_dir, snapshot_name, test_loader, **kwargs):
        ckpt = CheckpointManager(snapshot_dir)
        restored = ckpt.load_model(snapshot_name, state.params, state.buffers)
        return cls(cfg, model, restored["params"], restored["buffers"], test_loader, **kwargs)

    def run(self) -> dict:
        board = SummaryBoard(adaptive=True)
        timer = Timer()
        timer.record()
        for i, (data, meta) in enumerate(self.test_loader):
            timer.add_prepare_time()
            output = self.forward(self.params, self.buffers, data)
            output = jax.block_until_ready(output)
            timer.add_process_time()
            if "transform" in data:
                metrics = jax.device_get(evaluate(output, data["transform"], self.cfg.eval))
                board.update_from_result_dict(metrics)
            if self.after_test_step is not None:
                self.after_test_step(i, data, meta, jax.device_get(output))
            timer.record()
        summary = board.summary()
        self.logger.info("[Test] " + get_log_string(summary, timer=timer))
        return summary
