"""Measure the KPConv influence+contraction einsum chain at the real
backbone shapes.

The fused Pallas kernel this used to A/B was retired in r04: its
single-lane dynamic slices do not compile under Mosaic, and the XLA chain
already runs at the HBM floor for this op (writing the (M, K, C)
accumulator alone is ~0.15 ms of bandwidth at L0; measured 0.22 ms total).
Numbers + verdict in DESIGN.md r04 §6.3. This tool keeps the XLA floor
measurement.

Usage: python tools/bench_kpconv_kernel.py [--inner 20] [--out FILE.json]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from _timing import scan_timeit


def _xla_reference(neighbors, feats, valid, kernel_points, sigma):
    """The module's einsum formulation (models/kpconv.py aggregate), f32."""
    import jax.numpy as jnp

    n_sq = jnp.sum(neighbors**2, axis=-1)
    k_sq = jnp.sum(kernel_points**2, axis=-1)
    nk = jnp.einsum("mhd,kd->mhk", neighbors, kernel_points,
                    preferred_element_type=jnp.float32)
    sq_d = jnp.maximum(n_sq[:, :, None] - 2.0 * nk + k_sq[None, None, :], 0.0)
    nw = jnp.maximum(1.0 - jnp.sqrt(sq_d) / sigma, 0.0)
    nw = nw * valid.astype(jnp.float32)[:, :, None]
    return jnp.einsum("mhk,mhc->mkc", nw, feats.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


# (name, M, H, C): the 3DMatch-stage4 full-caps backbone hot shapes —
# level 0 carries 30720-pt clouds at C=64/128, level 1 7680 at 128/256
SHAPES = [
    ("L0_c64", 30720, 38, 64),
    ("L0_c128", 30720, 38, 128),
    ("L1_c128", 7680, 36, 128),
    ("L1_c256", 7680, 36, 256),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inner", type=int, default=20)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    k, sigma = 15, 0.0625
    rng = np.random.default_rng(0)
    kp = jnp.array(rng.normal(scale=0.04, size=(k, 3)), jnp.float32)
    results = {}

    for name, m, h, c in SHAPES:
        neighbors = jnp.array(rng.normal(scale=0.05, size=(m, h, 3)), jnp.float32)
        valid = jnp.array(rng.random((m, h)) > 0.1)
        feats_f32 = jnp.array(rng.normal(size=(m, h, c)), jnp.float32)
        feats_bf16 = feats_f32.astype(jnp.bfloat16)
        row = {}
        for label, feats in (("f32", feats_f32), ("bf16", feats_bf16)):
            # feats/valid must be real arguments: closing over them bakes
            # ~300 MB of constants into the HLO and the remote-compile
            # request is rejected with HTTP 413 (measured r04)
            ms_x = scan_timeit(
                f"{name} xla_{label}",
                lambda nb, f, v: _xla_reference(nb, f, v, kp, sigma),
                neighbors, feats, valid, inner=args.inner)
            row[label] = {"xla_ms": ms_x}
            print(f"  {name} {label}: xla {ms_x:.3f} ms", flush=True)
        results[name] = row

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
