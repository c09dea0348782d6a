"""Device / reproducibility helpers.

Ref parity roles: utils/torch.py:83-123 (`initialize` seeding, `to_cuda` /
`release_cuda` recursive transfers). JAX analogues: one seed fans out into
named PRNG keys; pytrees move with device_put / device_get.
"""

from __future__ import annotations

import random
from typing import Any, Dict, Optional

import jax
import numpy as np


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
