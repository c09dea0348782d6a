"""Sustained synthetic training run (any backend): N steps of the full
jitted train step over generated pairs + epoch snapshotting. Serves as an
end-to-end training validation when no dataset files are present.

Usage: python tools/train_synthetic.py --steps 50 --scale 0.25
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--scale", type=float, default=0.25, help="capacity scale of the 3DMatch config")
    parser.add_argument("--snapshot_dir", default="/tmp/gt_synth_snapshots")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from ref_geotransformer_tpu.engine import create_train_state, make_train_step
    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager

    cfg, model, variables, data = g._flagship_setup(scale=args.scale)
    batch = jax.tree_util.tree_map(lambda x: x[None], data)
    state, schedule = create_train_state(model, data, cfg.optim, steps_per_epoch=args.steps,
                                         rng=jax.random.key(0))
    step = make_train_step(model, cfg, donate=False)

    t0 = time.time()
    state, losses = step(state, batch, jax.random.key(1))
    first = float(losses["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s  loss {first:.4f}", flush=True)

    t0 = time.time()
    rng = jax.random.key(2)
    for i in range(args.steps - 1):
        rng, sub = jax.random.split(rng)
        state, losses = step(state, batch, sub)
    last = float(losses["loss"])
    # force full synchronization: fetching only the loss does NOT wait for
    # the optimizer update on async backends — sync on a parameter leaf
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    dt = (time.time() - t0) / max(args.steps - 1, 1)
    print(f"{args.steps} steps: {dt * 1e3:.1f} ms/step  loss {first:.4f} -> {last:.4f}", flush=True)
    assert np.isfinite(last)

    ckpt = CheckpointManager(args.snapshot_dir)
    ckpt.save_snapshot(state, epoch=1, iteration=args.steps)
    restored, epoch, iteration = ckpt.load_snapshot(state)
    assert iteration == args.steps
    print(f"snapshot saved + restored at iteration {iteration} ok", flush=True)


if __name__ == "__main__":
    main()
