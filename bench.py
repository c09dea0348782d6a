"""Benchmark: end-to-end registration pairs/sec on one chip.

Runs the full jitted pipeline — on-device pyramid build (voxel subsample +
radius searches) + KPConv-FPN + geometric transformer + Sinkhorn + LGR — on
the real 3DMatch demo pair (data/demo), steady-state, and prints ONE JSON
line.

Baseline: the reference publishes no pairs/sec. Estimate for the full
single-GPU PyTorch pipeline (CPU collate with C++ voxel grid + KD-tree per
pair, then GPU forward at batch 1): ~5 pairs/sec on the reference's
environment (model forward ~100ms plus per-pair CPU precompute; GeoTransformer
paper reports 0.296s/pair total pose time on 3DMatch with RANSAC-free LGR).
We use BASELINE_PAIRS_PER_SEC = 5.0; vs_baseline = ours / baseline.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 5.0


def main():
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "experiments", "geotransformer_3dmatch_stage4"))

    import dataclasses

    import jax

    # honor JAX_PLATFORMS=cpu even where a site plugin pins the platform list
    if os.environ.get("JAX_PLATFORMS", "").strip().startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp

    from config import make_cfg
    from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
    from ref_geotransformer_tpu.models import GeoTransformer, init_model_variables

    # experiment knobs: BENCH_DTYPE=bfloat16 BENCH_BATCH=4 BENCH_SMOKE=1
    # BENCH_FULL=1 (full 3DMatch training capacities instead of demo caps)
    full = os.environ.get("BENCH_FULL") == "1"
    cfg = make_cfg(demo=not full)
    bench_dtype = os.environ.get("BENCH_DTYPE", cfg.backbone.dtype)
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    smoke = os.environ.get("BENCH_SMOKE") == "1"  # tiny caps: contract test on CPU
    if bench_dtype != cfg.backbone.dtype:
        cfg = cfg.replace(backbone=dataclasses.replace(cfg.backbone, dtype=bench_dtype))
    if smoke:
        from ref_geotransformer_tpu.config import CapacityConfig

        cfg = cfg.replace(
            capacities=CapacityConfig(
                points=(1024, 384, 160, 128),
                neighbor_limits=tuple(min(nl, 128) for nl in cfg.capacities.neighbor_limits),
                gt_candidates=512,
                correspondence_limit=1024,
                search_chunk=256,
            )
        )
    root = osp.dirname(osp.abspath(__file__))
    ref_raw = np.load(osp.join(root, "data", "demo", "ref.npy")).astype(np.float32)
    src_raw = np.load(osp.join(root, "data", "demo", "src.npy")).astype(np.float32)
    gt = np.load(osp.join(root, "data", "demo", "gt.npy")).astype(np.float32)

    cap0 = cfg.capacities.points[0]
    if smoke:
        ref_raw = ref_raw[: cap0 - 64]
        src_raw = src_raw[: cap0 - 64]
    ref_p, ref_m = pad_points(ref_raw, cap0)
    src_p, src_m = pad_points(src_raw, cap0)

    model = GeoTransformer(cfg)

    @jax.jit
    def full_pipeline(variables, ref_p, ref_m, src_p, src_m):
        data = build_registration_inputs(
            ref_p, ref_m, src_p, src_m,
            cfg.backbone.num_stages,
            cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius,
            cfg.capacities.neighbor_limits,
            cfg.capacities.points,
            search_chunk=cfg.capacities.search_chunk,
        )
        return model.apply(variables, data)["estimated_transform"]

    variables = init_model_variables(model, cfg, jax.random.key(0))

    if batch > 1:
        batched = jax.jit(jax.vmap(full_pipeline, in_axes=(None, 0, 0, 0, 0)))
        tile = lambda x: jnp.broadcast_to(jnp.array(x)[None], (batch,) + x.shape)
        args = (variables, tile(ref_p), tile(ref_m), tile(src_p), tile(src_m))
        run = batched
    else:
        args = (variables, jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m))
        run = full_pipeline

    # AOT-compile ONCE: the compiled executable both provides XLA's cost
    # analysis (analytic FLOPs -> MFU) and is what we time (jit would
    # compile the same graph a second time). Peak is the bf16 MXU rate of
    # the bench chip (v5e: 197 TFLOP/s); override with BENCH_PEAK_TFLOPS.
    flops_per_exec = None
    try:
        compiled = run.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_exec = float(ca.get("flops", 0.0)) or None
        run = compiled
    except Exception:
        pass
    peak_flops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12

    # warmup (device_get forces a real round-trip; block_until_ready alone
    # is unreliable over the axon tunnel)
    jax.device_get(run(*args))

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = run(*args)
    jax.device_get(out)
    dt = (time.time() - t0) / iters
    pairs_per_sec = batch / dt

    payload = {
        "metric": "3dmatch_full_pairs_per_sec" if full else "3dmatch_demo_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "batch": batch,
        "dtype": bench_dtype,
    }
    if flops_per_exec:
        payload["gflops_per_pair"] = round(flops_per_exec / batch / 1e9, 2)
        payload["mfu_pct"] = round(100.0 * flops_per_exec / dt / peak_flops, 3)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
