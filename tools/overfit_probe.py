"""Overfit probe: does optimizing the loss make registration metrics rise?

Trains the flagship model on a tiny fixed set of synthetic pairs and logs the
loss + eval metrics (PIR/IR/RRE/RTE/RMSE/RR) trajectory. This is the
reference's own correctness-probe pattern (the ModelNet `overfitting_index`
mode, /root/reference/geotransformer/datasets/registration/modelnet/dataset.py:64,92-98):
if the loss->metric causal chain is sound, a handful of pairs overfit to
near-perfect inlier ratios and RR=1.

Usage: python tools/overfit_probe.py --steps 300 --scale 0.25 --pairs 2
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def run_probe(steps: int = 300, scale: float = 0.25, pairs: int = 2,
              log_every: int = 20, lr: float = None, out: str = None) -> dict:
    """Train the flagship model on `pairs` fixed synthetic pairs and return
    the {loss, PIR/IR/RRE/RTE/RMSE/RR} trajectory (the loss->registration
    causal probe; committed full-scale artifact: OVERFIT_PROBE_r03.json)."""
    import dataclasses

    import jax
    import numpy as np

    from ref_geotransformer_tpu.utils.jax_utils import setup_compilation_cache

    setup_compilation_cache()

    import __graft_entry__ as g
    from ref_geotransformer_tpu.engine import create_train_state, make_eval_step, make_train_step

    cfg, model, variables, data0 = g._flagship_setup(scale=scale)
    if lr is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=lr))

    # a few distinct pairs (different seeds of the same synthetic surface)
    pair_list = [data0]
    if pairs > 1:
        rng = np.random.default_rng(99)
        import jax.numpy as jnp

        from ref_geotransformer_tpu.data import build_registration_inputs, pad_points
        from scipy.spatial.transform import Rotation

        cap0 = cfg.capacities.points[0]
        for _ in range(pairs - 1):
            n = cap0 * 3 // 4
            base = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
            base[:, 2] = 0.3 * np.sin(3 * base[:, 0]) + 0.2 * base[:, 1]
            gt = np.eye(4, dtype=np.float32)
            gt[:3, :3] = Rotation.from_euler(
                "xyz", rng.uniform(-35, 35, 3), degrees=True
            ).as_matrix()
            gt[:3, 3] = rng.uniform(-0.3, 0.3, 3)
            ref = base[rng.permutation(n)[: int(n * 0.9)]]
            src_sel = base[rng.permutation(n)[: int(n * 0.9)]]
            src = (src_sel - gt[:3, 3]) @ gt[:3, :3]
            ref_p, ref_m = pad_points(ref, cap0)
            src_p, src_m = pad_points(src, cap0)
            pair_list.append(
                build_registration_inputs(
                    jnp.array(ref_p), jnp.array(ref_m), jnp.array(src_p), jnp.array(src_m),
                    cfg.backbone.num_stages,
                    cfg.backbone.init_voxel_size,
                    cfg.backbone.init_radius,
                    cfg.capacities.neighbor_limits,
                    cfg.capacities.points,
                    transform=jnp.array(gt),
                    search_chunk=cfg.capacities.search_chunk,
                )
            )

    import jax.numpy as jnp

    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *pair_list)
    state, _ = create_train_state(
        model, pair_list[0], cfg.optim, steps_per_epoch=steps, rng=jax.random.key(0)
    )
    train_step = make_train_step(model, cfg, donate=False)
    eval_step = make_eval_step(model, cfg)

    def notfinite_count(opt_state):
        """optax.apply_if_finite skip counter (silent-freeze diagnostic)."""
        found = []

        def rec(x):
            if hasattr(x, "notfinite_count"):
                found.append(int(jax.device_get(x.notfinite_count)))
            if hasattr(x, "_fields"):
                for f in x._fields:
                    rec(getattr(x, f))
            elif isinstance(x, (list, tuple)):
                for y in x:
                    rec(y)

        rec(opt_state)
        return max(found) if found else -1

    traj = []
    rng = jax.random.key(1)
    losses = None
    t0 = time.time()
    for i in range(steps + 1):
        if i % log_every == 0:
            m = jax.device_get(eval_step(state, batch))
            row = {"step": i, **{k: round(float(v), 4) for k, v in m.items()}}
            if losses is not None:
                row["train_loss"] = round(float(losses["loss"]), 4)
            row["skipped_steps"] = notfinite_count(state.opt_state)
            traj.append(row)
            print(json.dumps(row), flush=True)
        if i == steps:
            break
        rng, sub = jax.random.split(rng)
        state, losses = train_step(state, batch, sub)
    dt = time.time() - t0
    result = {
        "tool": "overfit_probe", "steps": steps, "pairs": pairs,
        "scale": scale, "lr": lr or cfg.optim.lr,
        "seconds": round(dt, 1), "trajectory": traj,
    }
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "trajectory"}))
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--scale", type=float, default=0.25)
    parser.add_argument("--pairs", type=int, default=2)
    parser.add_argument("--log_every", type=int, default=20)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--out", default=None, help="write trajectory JSON here")
    args = parser.parse_args()
    run_probe(steps=args.steps, scale=args.scale, pairs=args.pairs,
              log_every=args.log_every, lr=args.lr, out=args.out)


if __name__ == "__main__":
    main()
