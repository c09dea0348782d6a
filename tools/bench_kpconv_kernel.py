"""A/B the fused Pallas KPConv influence+contraction kernel against the
einsum chain at the real backbone shapes (the ~18 ms/pair level-0/1 floor,
DESIGN.md round-2 decomposition).

Per shape/variant: scan-amortized forward time (tools/_timing.py floor
correction) + max abs error vs the f32 einsum reference.

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

    from ref_geotransformer_tpu.ops.pallas_kpconv import (
        _xla_reference, kpconv_aggregate_pallas,
    )

    k, sigma = 15, 0.0625
    rng = np.random.default_rng(0)
    kp = jnp.array(rng.normal(scale=0.04, size=(k, 3)), jnp.float32)
    results = {}

    for name, m, h, c in SHAPES:
        neighbors = jnp.array(rng.normal(scale=0.05, size=(m, h, 3)), jnp.float32)
        valid = jnp.array(rng.random((m, h)) > 0.1)
        feats_f32 = jnp.array(rng.normal(size=(m, h, c)), jnp.float32)
        feats_bf16 = feats_f32.astype(jnp.bfloat16)
        want = np.array(jax.jit(
            lambda nb, f, v: _xla_reference(nb, f, v, kp, sigma)
        )(neighbors, feats_f32, valid))

        row = {}
        for label, feats in (("f32", feats_f32), ("bf16", feats_bf16)):
            # feats/valid must be real arguments: closing over them bakes
            # ~300 MB of constants into the HLO and the remote-compile
            # request is rejected with HTTP 413 (measured r04)
            ms_x = scan_timeit(
                f"{name} xla_{label}",
                lambda nb, f, v: _xla_reference(nb, f, v, kp, sigma),
                neighbors, feats, valid, inner=args.inner)
            ms_p = scan_timeit(
                f"{name} pallas_{label}",
                lambda nb, f, v: kpconv_aggregate_pallas(nb, f, v, kp, sigma),
                neighbors, feats, valid, inner=args.inner)
            got = np.array(jax.jit(
                lambda nb, f, v: kpconv_aggregate_pallas(nb, f, v, kp, sigma)
            )(neighbors, feats, valid))
            err = float(np.max(np.abs(got - want)))
            row[label] = {"xla_ms": ms_x, "pallas_ms": ms_p, "max_err_vs_f32": err}
            print(f"  {name} {label}: xla {ms_x:.3f} ms, pallas {ms_p:.3f} ms, "
                  f"err {err:.2e}", flush=True)
        results[name] = row

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
