"""3DMatch training entry point.

Ref parity: experiments/geotransformer.3dmatch.../trainval.py:14-62 — Adam +
StepLR(0.95/epoch) over 40 epochs, LR scaled by the data-parallel replica
count (base_trainer.py:210-215), per-epoch snapshots, --resume.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", action="store_true", help="resume from the rolling snapshot")
    parser.add_argument("--batch_size", type=int, default=None, help="global pairs per step")
    parser.add_argument("--num_devices", type=int, default=None, help="data-parallel devices")
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--max_epoch", type=int, default=None, help="override cfg.optim.max_epoch")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from config import LOG_DIR, SNAPSHOT_DIR, make_cfg
    from dataset import train_valid_data_loader
    from ref_geotransformer_tpu.engine import EpochBasedTrainer, create_train_state
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer
    from ref_geotransformer_tpu.parallel import make_mesh
    from ref_geotransformer_tpu.utils.common import ensure_dir

    ensure_dir(SNAPSHOT_DIR)
    ensure_dir(LOG_DIR)

    cfg = make_cfg()
    if args.max_epoch is not None:
        import dataclasses

        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, max_epoch=args.max_epoch))
    num_devices = args.num_devices or jax.device_count()
    batch_size = args.batch_size or max(cfg.train.batch_size, num_devices)
    mesh = make_mesh(num_devices=num_devices) if num_devices > 1 else None

    train_loader, valid_loader = train_valid_data_loader(cfg, batch_size=batch_size)

    model = GeoTransformer(cfg)
    example = next(iter(train_loader))
    example_pair = jax.tree_util.tree_map(lambda x: x[0], example)
    # stderr breadcrumb: model.init is the first big on-device compile, and a
    # cold TPU server can take many minutes here with no other output
    import datetime
    import sys as _sys

    print(f"[{datetime.datetime.now():%H:%M:%S}] initializing model "
          f"(first on-device compile; minutes on a cold TPU server)...",
          file=_sys.stderr, flush=True)
    state, schedule = create_train_state(
        model,
        ensure_pyramids(cfg, example_pair),
        cfg.optim,
        steps_per_epoch=len(train_loader),
        rng=jax.random.key(cfg.seed),
        lr_scale=float(num_devices),  # the reference's LR x world_size rule
    )

    trainer = EpochBasedTrainer(
        cfg,
        model,
        state,
        schedule,
        train_loader,
        valid_loader,
        mesh=mesh,
        snapshot_dir=SNAPSHOT_DIR,
        log_file=osp.join(LOG_DIR, "train.log"),
        log_steps=args.log_steps,
        seed=cfg.seed,
    )
    trainer.run(resume=args.resume)


if __name__ == "__main__":
    main()
