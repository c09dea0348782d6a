"""Checkpoint/resume via orbax.

Ref parity: engine/base_trainer.py:114-188 — per-epoch `epoch-N` snapshots
(model only) plus a rolling `snapshot` with model + optimizer + schedule
position, resumable with `--resume`. Orbax handles the atomic-write and
sharded-array layout that the reference's torch.save does not need.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Snapshot directory layout:

        <snapshot_dir>/epoch-<N>/   : params + buffers only
        <snapshot_dir>/snapshot/    : params + buffers + opt_state + step/epoch
    """

    def __init__(self, snapshot_dir: str):
        self.snapshot_dir = os.path.abspath(snapshot_dir)
        os.makedirs(self.snapshot_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.snapshot_dir, name)

    def save_epoch(self, name: str, params, buffers) -> None:
        """Model-only snapshot (reference's epoch-N.pth.tar)."""
        payload = {"params": params, "buffers": buffers}
        self._ckpt.save(self._path(name), payload, force=True)
        self._ckpt.wait_until_finished()

    def save_snapshot(self, state, epoch: int, iteration: int) -> None:
        """Full rolling snapshot (reference's snapshot.pth.tar)."""
        payload = {
            "params": state.params,
            "buffers": state.buffers,
            "opt_state": state.opt_state,
            "step": state.step,
            "meta": {"epoch": epoch, "iteration": iteration},
        }
        self._ckpt.save(self._path("snapshot"), payload, force=True)
        self._ckpt.wait_until_finished()

    def load_model(self, name: str, params_like, buffers_like) -> Dict[str, Any]:
        """Restore params/buffers from an epoch snapshot."""
        target = {"params": params_like, "buffers": buffers_like}
        return self._ckpt.restore(self._path(name), target=target)

    def load_snapshot(self, state) -> tuple:
        """Restore a full training state; returns (state, epoch, iteration)."""
        target = {
            "params": state.params,
            "buffers": state.buffers,
            "opt_state": state.opt_state,
            "step": state.step,
            "meta": {"epoch": 0, "iteration": 0},
        }
        restored = self._ckpt.restore(self._path("snapshot"), target=target)
        state = state.replace(
            params=restored["params"],
            buffers=restored["buffers"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, restored["meta"]["epoch"], restored["meta"]["iteration"]

    def has_snapshot(self) -> bool:
        return os.path.isdir(self._path("snapshot"))

    def list_epochs(self) -> list:
        return sorted(
            d for d in os.listdir(self.snapshot_dir) if d.startswith("epoch-") and os.path.isdir(self._path(d))
        )
