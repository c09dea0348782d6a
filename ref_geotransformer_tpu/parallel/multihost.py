"""Multi-host (multi-process) SPMD plumbing.

The reference trains multi-node via `torch.distributed.launch` + NCCL DDP
(`engine/base_trainer.py:66-78`, `README.md:179`) with a DistributedSampler
(`utils/torch.py:48-77`) and rank-0-gated logging/checkpointing
(`engine/logger.py:29-33`, `base_trainer.py:115`). The TPU-native
equivalent: one `jax.distributed.initialize` call per process, a global
mesh over all hosts' devices (XLA collectives ride ICI within a slice, DCN
across slices), per-process dataset shards (`PairLoader(num_shards,
shard_index)`), and process-0 gating for host-side side effects.

`--multihost` is wired through every experiment trainval entry point (all
of them route through `engine.cli.trainval_parser` +
`maybe_initialize_multihost`), so a pod run is `python trainval.py
--multihost` per host, mirroring the reference's launcher contract. The
multi-process path is exercised in-sandbox by a real 2-process CPU
integration test (tests/test_multihost.py: localhost coordinator,
process-disjoint shards, is_primary gating, cross-process metric equality).

ORDERING CONTRACT: `jax.distributed.initialize` must run before any other
JAX API initializes the XLA backends — even `jax.process_count()` or
`jax.default_backend()` do that, after which initialize raises
RuntimeError. So this module decides single-vs-multi-process purely from
the environment (explicit coordinator env vars, or TPU-pod metadata env
vars) and only touches `jax.process_*` AFTER the decision. Entry points
call `maybe_initialize_multihost(args)` immediately after argparse,
before building loaders or models.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_INITIALIZED = False

def _pod_env_present() -> bool:
    """True in a multi-process TPU/cluster environment whose coordinator
    jax.distributed.initialize() can auto-detect (Cloud TPU pod metadata,
    megascale, or an explicitly pre-set JAX coordinator). Checks env vars
    only, keeping the decision free of backend-initializing JAX calls.
    TPU_WORKER_HOSTNAMES counts only with >1 host: single-chip plugins set
    it to 'localhost'."""
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()]
    if len(hosts) > 1:
        return True
    return any(
        os.environ.get(v)
        for v in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )


def _distributed_already_initialized() -> bool:
    """True when jax.distributed.initialize already ran in this process
    (e.g. the launcher did it). Reads the client handle only — does not
    initialize any backend."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - internal-API drift guard
        return False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-process JAX runtime; returns (process_index, count).

    With no arguments, the coordinator comes from REF_GT_COORDINATOR /
    REF_GT_NUM_PROCESSES / REF_GT_PROCESS_ID — the analogue of
    torch.distributed.launch's env:// init (reference
    base_trainer.py:66-78) — or, absent those, from TPU-pod metadata
    auto-detection when the pod env vars are present. With neither, this is
    a single-process run and the call is a no-op (e.g. the CPU fixture
    stacks passing --multihost).

    MUST be called before any other JAX API (see module docstring).
    Idempotent; a second call is a no-op.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED or _distributed_already_initialized():
        _INITIALIZED = True
        return jax.process_index(), jax.process_count()

    coordinator_address = coordinator_address or os.environ.get("REF_GT_COORDINATOR")
    if num_processes is None and os.environ.get("REF_GT_NUM_PROCESSES"):
        num_processes = int(os.environ["REF_GT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("REF_GT_PROCESS_ID"):
        process_id = int(os.environ["REF_GT_PROCESS_ID"])

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif _pod_env_present():
        # TPU-pod / cluster metadata present: let JAX auto-detect.
        jax.distributed.initialize()
    # else: no coordinator info anywhere — a single-process run; calling
    # jax.distributed.initialize would raise.
    _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (logging,
    event files, snapshot writes) — the reference's rank-0 gate."""
    import jax

    return jax.process_index() == 0


def shard_spec() -> Tuple[int, int]:
    """(num_shards, shard_index) for PairLoader — the DistributedSampler
    analogue: each process reads a disjoint, equal-length (wrap-padded)
    slice of the dataset (reference utils/torch.py:48-77)."""
    import jax

    return jax.process_count(), jax.process_index()


def apply_multihost_sharding(loader) -> None:
    """Point an existing PairLoader at this process's dataset shard."""
    loader.num_shards, loader.shard_index = shard_spec()
