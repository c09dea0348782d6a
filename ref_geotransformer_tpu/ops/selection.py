"""Global approx/exact top-k selection switch.

The hot selection ops (neighbor tables, point-to-node patches, dense
correspondence top-C) default to the TPU-optimized PartialReduce
(`lax.approx_min_k` / `approx_max_k`, recall_target 0.95) — on CPU these
lower to an exact sort, so only real TPU runs see the approximate regime.

Setting `REF_GT_EXACT_SELECT=1` (read at import) forces exact `lax.top_k`
everywhere. `tools/ab_quality.py` uses this to A/B approximate-vs-exact
selection (and f32-vs-bf16 backbone) on real hardware: same trained weights,
eval metrics plus a train-loss trajectory per setting (results recorded in
DESIGN.md). Keeping the switch global and import-time makes it jit-static.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

EXACT = os.environ.get("REF_GT_EXACT_SELECT", "0") == "1"

# PartialReduce cost is steep in recall_target (measured on the level-0
# 20480^2 search, one v5e: 0.99 -> 67.6 ms, 0.95 -> 4.7, 0.90 -> 2.8,
# 0.80 -> 1.9; true-neighbor overlap vs exact 98.5% / 97.3% / 95.1% for
# 0.95/0.90/0.80). Default 0.90: its 30-step training trajectory matches
# 0.95's to 0.1% (within step noise, tools/ab_quality.py; both rows in
# DESIGN.md) and it saves ~40% of the selection time. REF_GT_RECALL
# overrides (e.g. 0.95 for the round-1 behavior).
_DEFAULT_RECALL = float(os.environ.get("REF_GT_RECALL", "0.90"))


def min_k(x: jnp.ndarray, k: int, recall_target: float = _DEFAULT_RECALL) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k smallest along the last axis, ascending. Approximate unless
    REF_GT_EXACT_SELECT=1."""
    if EXACT:
        neg, idx = jax.lax.top_k(-x, k)
        return -neg, idx
    return jax.lax.approx_min_k(x, k, recall_target=recall_target)


def max_k(x: jnp.ndarray, k: int, recall_target: float = _DEFAULT_RECALL) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k largest along the last axis, descending. Approximate unless
    REF_GT_EXACT_SELECT=1."""
    if EXACT:
        return jax.lax.top_k(x, k)
    return jax.lax.approx_max_k(x, k, recall_target=recall_target)
