"""Device / reproducibility helpers.

Ref parity roles: utils/torch.py:83-123 (`initialize` seeding, `to_cuda` /
`release_cuda` recursive transfers). JAX analogues: one seed fans out into
named PRNG keys; pytrees move with device_put / device_get.
"""

from __future__ import annotations

import os
import os.path as osp
import random
from typing import Any, Dict, Optional

import jax
import numpy as np


def honor_platform_env() -> None:
    """Make $JAX_PLATFORMS effective even when a site plugin pinned the
    platform list programmatically (the sandbox's axon TPU tunnel sets
    jax_platforms='axon,cpu' at import, after which the env var alone is a
    no-op). Entry points call this (via setup_compilation_cache) so
    `JAX_PLATFORMS=cpu trainval.py ...` really runs on CPU — the fixture
    CLI regressions (tests/test_fixture_cli_e2e.py) depend on it."""
    env = os.environ.get("JAX_PLATFORMS")
    if env and jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)


def setup_compilation_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache for every entry point.

    Full-caps 3DMatch train-step compiles take >20 min cold on the axon
    tunnel and ~3 min warm via the server-side cache, which only survives
    within one server lifetime; a disk cache makes warm starts survive fresh
    processes and machines. Location: $REF_GT_COMPILE_CACHE, else
    `<REF_GT_OUTPUT_ROOT>/xla_cache`, else `~/.cache/ref_gt_xla`.
    """
    honor_platform_env()
    if path is None:
        path = os.environ.get("REF_GT_COMPILE_CACHE")
    if path is None:
        out_root = os.environ.get("REF_GT_OUTPUT_ROOT")
        path = osp.join(out_root, "xla_cache") if out_root else osp.expanduser("~/.cache/ref_gt_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default min compile time is 1s; keep it but cache small entries too so
    # the many medium-size experiment graphs all hit
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def initialize(seed: Optional[int] = None) -> Optional[jax.Array]:
    """Seed python/numpy and return a JAX PRNG key (the reference also
    toggles cudnn determinism — XLA is deterministic by default)."""
    if seed is None:
        return None
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def to_device(tree: Any, device=None, sharding=None) -> Any:
    """Recursive host -> device transfer (to_cuda analogue)."""
    target = sharding or device
    if target is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, tree)
    return jax.device_put(tree, target)


def release_device(tree: Any) -> Any:
    """Recursive device -> host numpy transfer (release_cuda analogue)."""
    return jax.device_get(tree)


def tree_size_bytes(tree: Any) -> int:
    """Total parameter bytes of a pytree (for logging)."""
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(tree)
               if hasattr(leaf, "size"))
