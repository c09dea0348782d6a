"""Per-op timing of the pyramid build at demo caps (scan-amortized).

Usage: python tools/profile_pyramid.py [--inner 20] [--chunk 2048]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(
    0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments", "geotransformer_3dmatch_stage4")
)

import numpy as np

from _timing import scan_timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inner", type=int, default=20)
    parser.add_argument("--chunk", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from config import make_cfg
    from ref_geotransformer_tpu.data import pad_points
    from ref_geotransformer_tpu.data.pyramid import build_pyramid
    from ref_geotransformer_tpu.ops.neighbors import radius_search
    from ref_geotransformer_tpu.ops.subsample import grid_subsample

    cfg = make_cfg(demo=True)
    chunk = args.chunk or cfg.capacities.search_chunk
    caps = cfg.capacities.points
    nls = cfg.capacities.neighbor_limits
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    ref_raw = np.load(osp.join(root, "data", "demo", "ref.npy")).astype(np.float32)
    p0, m0 = pad_points(ref_raw, caps[0])
    p0, m0 = jnp.array(p0), jnp.array(m0)

    def timeit(name, fn, *fargs):
        scan_timeit(name, fn, *fargs, inner=args.inner)

    # materialize the real pyramid levels once
    full = jax.jit(
        lambda p, m: build_pyramid(p, m, 4, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
                                   nls, caps, chunk)
    )
    pyr = jax.device_get(full(p0, m0))
    pts = [jnp.array(x) for x in pyr["points"]]
    msk = [jnp.array(x) for x in pyr["masks"]]

    timeit("full build_pyramid (one cloud)", lambda p, m: build_pyramid(
        p, m, 4, cfg.backbone.init_voxel_size, cfg.backbone.init_radius, nls, caps, chunk), p0, m0)

    v = cfg.backbone.init_voxel_size
    for i in range(1, 4):
        v *= 2.0
        timeit(f"grid_subsample level {i-1}->{i} ({caps[i-1]}->{caps[i]})",
               lambda p, m, _v=v, _i=i: grid_subsample(p, m, _v, caps[_i]), pts[i - 1], msk[i - 1])

    r = cfg.backbone.init_radius
    for i in range(4):
        timeit(f"neighbors level {i} ({caps[i]}x{caps[i]} k={nls[i]})",
               lambda p, m, _r=r, _i=i: radius_search(p, p, m, m, _r, nls[_i], chunk),
               pts[i], msk[i])
        if i < 3:
            timeit(f"subsampling {i+1}<-{i} ({caps[i+1]}x{caps[i]})",
                   lambda q, p, qm, m, _r=r, _i=i: radius_search(q, p, qm, m, _r, nls[_i], chunk),
                   pts[i + 1], pts[i], msk[i + 1], msk[i])
            timeit(f"upsampling {i}<-{i+1} ({caps[i]}x{caps[i+1]})",
                   lambda q, p, qm, m, _r=r, _i=i: radius_search(q, p, qm, m, 2 * _r, nls[_i + 1], chunk),
                   pts[i], pts[i + 1], msk[i], msk[i + 1])
        r *= 2.0


if __name__ == "__main__":
    main()
