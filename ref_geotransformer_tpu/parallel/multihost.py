"""Multi-host (multi-process) SPMD plumbing.

The reference trains multi-node via `torch.distributed.launch` + NCCL DDP
(`engine/base_trainer.py:66-78`, `README.md:179`) with a DistributedSampler
(`utils/torch.py:48-77`) and rank-0-gated logging/checkpointing
(`engine/logger.py:29-33`, `base_trainer.py:115`). The TPU-native
equivalent: one `jax.distributed.initialize` call per process, a global
mesh over all hosts' devices (XLA collectives ride ICI within a slice, DCN
across slices), per-process dataset shards (`PairLoader(num_shards,
shard_index)`), and process-0 gating for host-side side effects.

Cannot be hardware-tested in this sandbox (single host, one chip); the
shard math and gating logic are unit-tested (tests/test_multihost.py), and
`--multihost` is wired through the experiment CLIs so a pod run is
`python trainval.py --multihost` per host, mirroring the reference's
launcher contract.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

_INITIALIZED = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-process JAX runtime; returns (process_index, count).

    With no arguments, `jax.distributed.initialize` auto-detects the
    coordinator from the TPU pod metadata (the normal path on Cloud TPU
    slices). Explicit values can come from REF_GT_COORDINATOR /
    REF_GT_NUM_PROCESSES / REF_GT_PROCESS_ID for non-TPU clusters — the
    analogue of torch.distributed.launch's env:// init
    (reference base_trainer.py:66-78). Safe to call once per process,
    before any other JAX API. Idempotent; a second call is a no-op.
    """
    global _INITIALIZED
    if _INITIALIZED or jax.process_count() > 1:
        _INITIALIZED = True
        return jax.process_index(), jax.process_count()

    coordinator_address = coordinator_address or os.environ.get("REF_GT_COORDINATOR")
    if num_processes is None and os.environ.get("REF_GT_NUM_PROCESSES"):
        num_processes = int(os.environ["REF_GT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("REF_GT_PROCESS_ID"):
        process_id = int(os.environ["REF_GT_PROCESS_ID"])

    if coordinator_address is None and jax.default_backend() != "tpu":
        # no coordinator info and no TPU-pod metadata to auto-detect from:
        # a single-process run (e.g. the CPU fixture stacks passing
        # --multihost) — calling jax.distributed.initialize would raise
        _INITIALIZED = True
        return 0, 1

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (logging,
    event files, snapshot writes) — the reference's rank-0 gate."""
    return jax.process_index() == 0


def shard_spec() -> Tuple[int, int]:
    """(num_shards, shard_index) for PairLoader — the DistributedSampler
    analogue: each process reads a disjoint, ceil-balanced slice of the
    dataset (reference utils/torch.py:58-60)."""
    return jax.process_count(), jax.process_index()


def apply_multihost_sharding(loader) -> None:
    """Point an existing PairLoader at this process's dataset shard."""
    loader.num_shards, loader.shard_index = shard_spec()
