"""Stage-by-stage timing of the registration pipeline on the current backend.

Usage: python tools/profile_stages.py [--iters 10]
Times (jitted, steady-state, forced round-trip): pyramid build, patch
partition + GT overlap map, backbone, geometric transformer, matching +
sinkhorn, LGR.
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
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--full", action="store_true", help="full 3DMatch caps (30720) instead of demo caps")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from config import make_cfg
    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.models import GeoTransformer, init_model_variables
    from ref_geotransformer_tpu.models.attention import RPEConditionalTransformer
    from ref_geotransformer_tpu.models.embedding import GeometricStructureEmbedding
    from ref_geotransformer_tpu.models.registration import get_node_correspondences, local_to_global_registration
    from ref_geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
    from ref_geotransformer_tpu.ops.index import masked_gather
    from ref_geotransformer_tpu.ops.partition import point_to_node_partition

    cfg = make_cfg(demo=not args.full)
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    ref_raw = np.load(osp.join(root, "data", "demo", "ref.npy")).astype(np.float32)
    src_raw = np.load(osp.join(root, "data", "demo", "src.npy")).astype(np.float32)
    cap0 = cfg.capacities.points[0]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)

    def fetch_scalar(out):
        # force full computation but transfer only bytes (big transfers over
        # the axon tunnel would otherwise dominate the measurement)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jax.device_get(jnp.sum(leaf.astype(jnp.float32)) if leaf.dtype != bool else jnp.sum(leaf))

    def timed(name, fn, *fn_args):
        out = fn(*fn_args)
        fetch_scalar(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*fn_args)
        fetch_scalar(out)
        print(f"{name:34s} {(time.time() - t0) / args.iters * 1e3:8.1f} ms", flush=True)
        return out

    def timed_scan(name, fn, perturb_arg, *fn_args, inner=20):
        """Floor-corrected scan-amortized timing (tools/_timing.py); the
        perturbed argument must be first."""
        assert perturb_arg == 0
        scan_timeit(name, fn, *fn_args, inner=inner)

    # tunnel/dispatch overhead per timed() call: a trivial op with the same
    # fetch pattern — subtract this mentally from every naive row
    timed("null op (per-call overhead)", jax.jit(lambda x: x * 2.0 + 1.0), jnp.ones((8,)))

    build = jax.jit(
        lambda a, b, c, d: build_registration_inputs(
            a, b, c, d,
            cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacities.neighbor_limits, cfg.capacities.points,
            transform=jnp.eye(4), search_chunk=cfg.capacities.search_chunk,
        )
    )
    data = timed("pyramid build", build, jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m))

    model = GeoTransformer(cfg)
    variables = init_model_variables(model, cfg, jax.random.key(0))

    fwd = jax.jit(lambda v, d: model.apply(v, d)["estimated_transform"])
    timed("full model forward", fwd, variables, data)

    # scan-amortized end-to-end (perturb raw ref points; pyramid + model)
    def e2e(rp, rm, sp, sm, v):
        d = build_registration_inputs(
            rp, rm, sp, sm,
            cfg.backbone.num_stages, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacities.neighbor_limits, cfg.capacities.points,
            transform=jnp.eye(4), search_chunk=cfg.capacities.search_chunk,
        )
        return model.apply(v, d)["estimated_transform"]

    timed_scan("pyramid + model (e2e)", e2e, 0,
               jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m), variables,
               inner=10)

    # --- stages ---
    k_patch = cfg.model.num_points_in_patch
    ref, src = data["ref"], data["src"]

    part = jax.jit(
        lambda: point_to_node_partition(
            ref["points"][1], ref["points"][-1], k_patch, ref["masks"][1], ref["masks"][-1]
        )
    )
    timed("point_to_node partition (x1)", part)

    _, ref_nm, ref_knn_i, ref_knn_m = part()
    _, src_nm, src_knn_i, src_knn_m = jax.jit(
        lambda: point_to_node_partition(
            src["points"][1], src["points"][-1], k_patch, src["masks"][1], src["masks"][-1]
        )
    )()
    ref_knn_p = masked_gather(ref["points"][1], ref_knn_i, 0.0)
    src_knn_p = masked_gather(src["points"][1], src_knn_i, 0.0)

    gt = jax.jit(
        lambda: get_node_correspondences(
            ref["points"][-1], src["points"][-1], ref_knn_p, src_knn_p, data["transform"],
            cfg.model.ground_truth_matching_radius, ref_nm, src_nm, ref_knn_m, src_knn_m,
            cfg.capacities.gt_candidates,
        )
    )
    timed("gt node correspondences", gt)

    # backbone alone (stacked pair, like the model)
    from ref_geotransformer_tpu.models.backbone import KPConvFPN

    backbone = GeoTransformer(cfg)  # reuse dims
    bb = KPConvFPN(
        cfg.backbone.input_dim, cfg.backbone.output_dim, cfg.backbone.init_dim,
        cfg.backbone.kernel_size, cfg.backbone.init_radius, cfg.backbone.init_sigma,
        cfg.backbone.group_norm, cfg.backbone.num_stages, cfg.backbone.fine_level,
    )
    import flax.linen as nn_linen

    bb_v = jax.vmap(lambda *a: None)  # placeholder to appease linters
    vbb = __import__("flax").linen.vmap(
        KPConvFPN, in_axes=0, out_axes=0,
        variable_axes={"params": None, "buffers": None},
        split_rngs={"params": False, "buffers": False},
    )(
        cfg.backbone.input_dim, cfg.backbone.output_dim, cfg.backbone.init_dim,
        cfg.backbone.kernel_size, cfg.backbone.init_radius, cfg.backbone.init_sigma,
        cfg.backbone.group_norm, cfg.backbone.num_stages, cfg.backbone.fine_level,
    )
    stacked = jax.tree_util.tree_map(lambda r, s: jnp.stack([r, s], 0), ref, src)
    feats0 = jnp.ones((2, cap0, 1), jnp.float32)
    bb_vars = jax.jit(vbb.init)(jax.random.key(0), feats0, stacked)
    bb_fn = jax.jit(lambda v, f, d: vbb.apply(v, f, d)[-1])
    timed("KPConv-FPN backbone (pair)", bb_fn, bb_vars, feats0, stacked)
    timed_scan("KPConv-FPN backbone (scan)", lambda f, v, d: vbb.apply(v, f, d)[-1], 0,
               feats0, bb_vars, stacked, inner=10)

    n_c = cfg.capacities.points[-1]
    h = cfg.geotransformer.hidden_dim
    pts_c = ref["points"][-1][None]
    msk_c = ref["masks"][-1][None]
    emb_mod = GeometricStructureEmbedding(
        h, cfg.geotransformer.sigma_d, cfg.geotransformer.sigma_a, cfg.geotransformer.angle_k
    )
    emb_vars = emb_mod.init(jax.random.key(0), pts_c, msk_c)
    emb_fn = jax.jit(lambda v, p, m: emb_mod.apply(v, p, m))
    emb = timed("geometric structure embedding", emb_fn, emb_vars, pts_c, msk_c)

    rpe = RPEConditionalTransformer(tuple(cfg.geotransformer.blocks), h, cfg.geotransformer.num_heads)
    hfeats = jnp.ones((1, n_c, h))
    rpe_vars = rpe.init(jax.random.key(0), hfeats, hfeats, emb, emb)
    rpe_fn = jax.jit(lambda v, f, e, m: rpe.apply(v, f, f, e, e, masks0=m, masks1=m))
    timed("RPE conditional transformer x6", rpe_fn, rpe_vars, hfeats, emb, msk_c)

    p = cfg.coarse_matching.num_correspondences
    scores = jnp.ones((p, k_patch, k_patch))
    ot = LearnableLogOptimalTransport(cfg.model.num_sinkhorn_iterations)
    ot_vars = ot.init(jax.random.key(0), scores)
    ot_fn = jax.jit(lambda v, s, rm, sm: ot.apply(v, s, rm, sm))
    ms = timed("sinkhorn (100 it)", ot_fn, ot_vars, scores, ref_knn_m[:p], src_knn_m[:p])

    lgr_fn = jax.jit(
        lambda s, rp, sp, rm, sm: local_to_global_registration(
            rp, sp, rm, sm, s, jnp.ones((s.shape[0],)),
            k=cfg.fine_matching.topk, acceptance_radius=cfg.fine_matching.acceptance_radius,
            correspondence_limit=cfg.capacities.correspondence_limit,
        ).estimated_transform
    )
    timed("local-to-global registration", lgr_fn, ms, ref_knn_p[:p], src_knn_p[:p],
          ref_knn_m[:p], src_knn_m[:p])


if __name__ == "__main__":
    main()
