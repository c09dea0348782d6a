"""Device mesh helpers — the TPU-native replacement for the reference's
torch.distributed/NCCL data parallelism (engine/base_trainer.py:66-78,
utils/torch.py:16-34).

One jitted program spans the whole mesh: parameters are replicated, the pair
batch is sharded over the 'data' axis, and XLA's SPMD partitioner inserts the
gradient all-reduce over ICI — no explicit process groups, no DDP wrapper.
A 'model' axis is reserved for intra-pair sharding (unused by the shipped
configs: the model is ~10-25M params and fits comfortably per chip, matching
the reference, which is also DP-only — SURVEY.md §2.15).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
