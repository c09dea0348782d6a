"""Per-block timing of the KPConv-FPN backbone at 3DMatch demo capacities.

The whole-backbone profile (tools/profile_stages.py) shows the backbone is
~78% of end-to-end inference; the gather micro-benchmark
(tools/bench_gather.py) bounds the gathers themselves at ~15 ms. This tool
times every encoder/decoder block in isolation (scan-amortized inside one
jit, inputs perturbed per iteration so nothing CSEs) to locate the rest.

Usage: python tools/profile_backbone.py [--inner 10]
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
    parser.add_argument("--inner", type=int, default=10)
    parser.add_argument("--dtype", default=None, help="override backbone compute dtype")
    parser.add_argument("--full", action="store_true", help="full 3DMatch caps (30720)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from config import make_cfg
    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.models.kpconv import ConvBlock, LastUnaryBlock, ResidualBlock, UnaryBlock, nearest_upsample

    cfg = make_cfg(demo=not args.full)
    dtype_name = args.dtype or cfg.backbone.dtype
    cdtype = {"bfloat16": jnp.bfloat16, "float32": None}[dtype_name]
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    ref_raw = np.load(osp.join(root, "data", "demo", "ref.npy")).astype(np.float32)
    src_raw = np.load(osp.join(root, "data", "demo", "src.npy")).astype(np.float32)
    cap0 = cfg.capacities.points[0]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)

    build = jax.jit(
        lambda a, b, c, d: build_registration_inputs(
            a, b, c, d,
            cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacities.neighbor_limits, cfg.capacities.points,
            transform=jnp.eye(4), search_chunk=cfg.capacities.search_chunk,
        )
    )
    data = build(jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m))
    # stack ref+src like the in-model vmap
    ref, src = data["ref"], data["src"]
    pts = [jnp.stack([r, s]) for r, s in zip(ref["points"], src["points"])]
    msk = [jnp.stack([r, s]) for r, s in zip(ref["masks"], src["masks"])]
    nbr = [jnp.stack([r, s]) for r, s in zip(ref["neighbors"], src["neighbors"])]
    sub = [jnp.stack([r, s]) for r, s in zip(ref["subsampling"], src["subsampling"])]
    ups = [jnp.stack([r, s]) for r, s in zip(ref["upsampling"], src["upsampling"])]

    rng = jax.random.key(0)
    d = cfg.backbone.init_dim  # 64
    ks = cfg.backbone.kernel_size
    r0, s0 = cfg.backbone.init_radius, cfg.backbone.init_sigma
    gn = cfg.backbone.group_norm

    def vmapped(cls, **kw):
        return nn.vmap(
            cls, in_axes=0, out_axes=0,
            variable_axes={"params": None, "buffers": None},
            split_rngs={"params": False, "buffers": False},
        )(**kw)

    total = 0.0

    def timed(name, cls_kwargs_call):
        nonlocal total
        cls, kwargs, call_args = cls_kwargs_call
        mod = vmapped(cls, **kwargs)
        variables = mod.init(rng, *call_args)
        a0, rest = call_args[0], call_args[1:]
        total += scan_timeit(name, lambda x, *r: mod.apply(variables, x, *r), a0, *rest,
                             inner=args.inner)

    kp = dict(kernel_size=ks, radius=r0, sigma=s0, group_norm=gn, compute_dtype=cdtype)
    f0 = jnp.ones((2, cap0, cfg.backbone.input_dim), jnp.float32)
    x1 = jnp.ones((2, cap0, d), jnp.float32)
    timed("encoder1_1 ConvBlock 1->64 @20480 H38",
          (ConvBlock, dict(in_channels=1, out_channels=d, **kp), (f0, pts[0], pts[0], nbr[0], msk[0])))
    timed("encoder1_2 Residual 64->128 @20480 H38",
          (ResidualBlock, dict(in_channels=d, out_channels=2 * d, **kp), (x1, pts[0], pts[0], nbr[0], msk[0])))

    x2in = jnp.ones((2, cap0, 2 * d), jnp.float32)
    timed("encoder2_1 strided 128->128 @6144<-20480 H38",
          (ResidualBlock, dict(in_channels=2 * d, out_channels=2 * d, strided=True, **kp),
           (x2in, pts[1], pts[0], sub[0], msk[1], msk[0])))
    kp2 = dict(kernel_size=ks, radius=2 * r0, sigma=2 * s0, group_norm=gn, compute_dtype=cdtype)
    x2 = jnp.ones((2, pts[1].shape[1], 2 * d), jnp.float32)
    timed("encoder2_2 Residual 128->256 @6144 H36",
          (ResidualBlock, dict(in_channels=2 * d, out_channels=4 * d, **kp2), (x2, pts[1], pts[1], nbr[1], msk[1])))
    x2b = jnp.ones((2, pts[1].shape[1], 4 * d), jnp.float32)
    timed("encoder2_3 Residual 256->256 @6144 H36",
          (ResidualBlock, dict(in_channels=4 * d, out_channels=4 * d, **kp2), (x2b, pts[1], pts[1], nbr[1], msk[1])))

    timed("encoder3_1 strided 256->256 @2048<-6144 H36",
          (ResidualBlock, dict(in_channels=4 * d, out_channels=4 * d, strided=True, **kp2),
           (x2b, pts[2], pts[1], sub[1], msk[2], msk[1])))
    kp3 = dict(kernel_size=ks, radius=4 * r0, sigma=4 * s0, group_norm=gn, compute_dtype=cdtype)
    x3 = jnp.ones((2, pts[2].shape[1], 4 * d), jnp.float32)
    timed("encoder3_2 Residual 256->512 @2048 H36",
          (ResidualBlock, dict(in_channels=4 * d, out_channels=8 * d, **kp3), (x3, pts[2], pts[2], nbr[2], msk[2])))
    x3b = jnp.ones((2, pts[2].shape[1], 8 * d), jnp.float32)
    timed("encoder3_3 Residual 512->512 @2048 H36",
          (ResidualBlock, dict(in_channels=8 * d, out_channels=8 * d, **kp3), (x3b, pts[2], pts[2], nbr[2], msk[2])))

    timed("encoder4_1 strided 512->512 @512<-2048 H36",
          (ResidualBlock, dict(in_channels=8 * d, out_channels=8 * d, strided=True, **kp3),
           (x3b, pts[3], pts[2], sub[2], msk[3], msk[2])))
    kp4 = dict(kernel_size=ks, radius=8 * r0, sigma=8 * s0, group_norm=gn, compute_dtype=cdtype)
    x4 = jnp.ones((2, pts[3].shape[1], 8 * d), jnp.float32)
    timed("encoder4_2 Residual 512->1024 @512 H38",
          (ResidualBlock, dict(in_channels=8 * d, out_channels=16 * d, **kp4), (x4, pts[3], pts[3], nbr[3], msk[3])))
    x4b = jnp.ones((2, pts[3].shape[1], 16 * d), jnp.float32)
    timed("encoder4_3 Residual 1024->1024 @512 H38",
          (ResidualBlock, dict(in_channels=16 * d, out_channels=16 * d, **kp4), (x4b, pts[3], pts[3], nbr[3], msk[3])))

    # decoders: upsample gathers + unary blocks
    class Dec3(nn.Module):
        @nn.compact
        def __call__(self, lat, skip, up_idx, m):
            up = nearest_upsample(lat, up_idx)
            cat = jnp.concatenate([up, skip], axis=1)
            return UnaryBlock(cat.shape[1], 8 * d, gn, name="u")(cat, m)

    class Dec2(nn.Module):
        @nn.compact
        def __call__(self, lat, skip, up_idx):
            up = nearest_upsample(lat, up_idx)
            cat = jnp.concatenate([up, skip], axis=1)
            return LastUnaryBlock(cat.shape[1], cfg.backbone.output_dim, name="u")(cat)

    timed("decoder3 up+unary -> 512 @2048",
          (Dec3, dict(), (x4b, x3b, ups[2], msk[2])))
    timed("decoder2 up+last -> 256 @6144",
          (Dec2, dict(), (jnp.ones((2, pts[2].shape[1], 8 * d), jnp.float32), x2b, ups[1])))

    print(f"{'TOTAL (sum of blocks)':46s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
