"""Shared scan-amortized timing for the profiling tools.

Two overheads poison naive micro-benchmarks on the axon-tunneled TPU:
  * per-CALL cost of a synchronous jit call + device_get round trip is
    ~25 ms (tunnel latency), regardless of content;
  * per-call async dispatch costs ~2 ms even without a fetch.

`scan_timeit` runs the op `inner` times inside ONE jitted lax.scan
(perturbing the first float argument per iteration so XLA cannot CSE or
hoist), measures best-of-3 calls, and subtracts a calibrated null-loop
floor, so the reported number is the marginal per-iteration cost.
"""

from __future__ import annotations

import time


_FLOOR_CACHE = {}


def _call_floor(inner: int) -> float:
    """Best-of-3 wall time of a scan loop with a trivial body."""
    import jax
    import jax.numpy as jnp

    if inner in _FLOOR_CACHE:
        return _FLOOR_CACHE[inner]

    @jax.jit
    def nullloop(x):
        def body(acc, i):
            return acc + x * i.astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return acc

    x = jnp.float32(1.0)
    jax.device_get(nullloop(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.device_get(nullloop(x))
        best = min(best, time.time() - t0)
    _FLOOR_CACHE[inner] = best
    return best


def scan_timeit(name, fn, *fargs, inner: int = 20, out_index=None):
    """Print and return the floor-corrected per-iteration cost of fn(*fargs).

    The first argument must be a float array (it is scaled by (1 + 1e-7 i)
    per iteration). By default EVERY output leaf is reduced into the carry
    so no part of the computation can be dead-code-eliminated; pass
    `out_index` to reduce a single leaf instead.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped(*a):
        def body(acc, i):
            scaled = (a[0] * (1.0 + 1e-7 * i.astype(jnp.float32)),) + a[1:]
            out = fn(*scaled)
            leaves = jax.tree_util.tree_leaves(out)
            if out_index is not None:
                leaves = [leaves[out_index]]
            for leaf in leaves:
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return acc

    jax.device_get(looped(*fargs))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.device_get(looped(*fargs))
        best = min(best, time.time() - t0)
    ms = max(best - _call_floor(inner), 0.0) / inner * 1e3
    print(f"{name:52s} {ms:7.2f} ms", flush=True)
    return ms
