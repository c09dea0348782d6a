"""Data-parallel plumbing: batch sharding + metric reduction.

Replaces DistributedSampler + all_reduce_tensors (utils/torch.py:16-77):
per-host batches are placed with a named sharding and jit's SPMD handles the
rest; metric dicts are already global means because the loss/metrics average
over the full (global) batch inside the jitted step.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batched pytree (leading dim = batch) onto the mesh, sharded
    over `axis`.

    Single-host: a plain sharded device_put. Multi-host: each process holds
    only its dataset shard (PairLoader num_shards/shard_index), so the local
    array is this process's slice of the global batch —
    `make_array_from_process_local_data` assembles the global jax.Array
    (leading dim = local_batch * process_count) without any cross-host
    copy. This is the hand-off point between the DistributedSampler
    analogue and the SPMD step."""
    sharding = NamedSharding(mesh, P(axis))

    if jax.process_count() > 1:
        def place(x):
            return jax.make_array_from_process_local_data(sharding, x)
    else:
        def place(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def all_reduce_mean_dict(metric_dict: Dict, axis_name: str = "data") -> Dict:
    """Mean-reduce a dict of scalars across an axis inside pmap/shard_map
    (utils/torch.py:16-34 parity, for explicitly collective code paths)."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in metric_dict.items()}
