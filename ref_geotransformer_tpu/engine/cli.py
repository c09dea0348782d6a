"""Shared experiment CLI drivers (the reference duplicates trainval/test
boilerplate per experiment dir; here it is factored once).

Ref parity: the argparse surface of engine/base_trainer.py:21-29 and
base_tester.py:15-21 (--resume, --snapshot/--test_epoch, batch/device knobs).
"""

from __future__ import annotations

import argparse
import os.path as osp
from typing import Callable, Optional


def trainval_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", action="store_true", help="resume from the rolling snapshot")
    parser.add_argument("--batch_size", type=int, default=None, help="global pairs per step")
    parser.add_argument("--num_devices", type=int, default=None, help="data-parallel devices")
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--max_epoch", type=int, default=None, help="override cfg.optim.max_epoch")
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="join a multi-process JAX runtime (jax.distributed.initialize; "
        "coordinator auto-detected on TPU pods or via REF_GT_COORDINATOR/"
        "REF_GT_NUM_PROCESSES/REF_GT_PROCESS_ID) — the reference's "
        "torch.distributed.launch analogue; one launch per host",
    )
    return parser


def iter_trainval_parser() -> argparse.ArgumentParser:
    """Parser for the iteration-based trainers (encoder / Cordi DDPM phases);
    shares the --multihost contract with trainval_parser. Ref parity:
    base_trainer.py:21-29 plus the fork's iteration knobs
    (iter_based_trainer.py:41-210)."""
    parser = trainval_parser()
    parser.add_argument("--max_iteration", type=int, default=None)
    parser.add_argument("--snapshot_steps", type=int, default=None)
    parser.add_argument("--use_modelnet", action="store_true",
                        help="train on ModelNet pairs instead of LineMod")
    return parser


def maybe_initialize_multihost(args) -> None:
    """If --multihost was passed, join the multi-process runtime NOW.

    Must be the first JAX-touching call in the process: even
    jax.device_count() initializes the XLA backends, after which
    jax.distributed.initialize raises. Entry points call this immediately
    after parsing args, before building cfg/loaders/models. Idempotent."""
    if getattr(args, "multihost", False):
        from ref_geotransformer_tpu.parallel.multihost import initialize_multihost

        initialize_multihost()


def apply_loader_sharding(args, *loaders) -> None:
    """DistributedSampler analogue: point each loader at this process's
    disjoint dataset shard (reference utils/torch.py:48-77)."""
    if getattr(args, "multihost", False):
        from ref_geotransformer_tpu.parallel.multihost import apply_multihost_sharding

        for loader in loaders:
            if loader is not None and hasattr(loader, "num_shards"):
                apply_multihost_sharding(loader)


def run_trainval(
    cfg,
    train_loader,
    valid_loader,
    snapshot_dir: str,
    log_dir: str,
    args,
) -> None:
    import jax

    from ref_geotransformer_tpu.engine import EpochBasedTrainer, create_train_state
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer
    from ref_geotransformer_tpu.parallel import make_mesh
    from ref_geotransformer_tpu.utils.common import ensure_dir

    # safety net for callers that skipped maybe_initialize_multihost
    # (idempotent; the entry points all call it right after argparse)
    maybe_initialize_multihost(args)
    apply_loader_sharding(args, train_loader, valid_loader)

    ensure_dir(snapshot_dir)
    ensure_dir(log_dir)
    if args.max_epoch is not None:
        cfg = cfg.replace(optim=type(cfg.optim)(**{**cfg.optim.__dict__, "max_epoch": args.max_epoch}))

    num_devices = args.num_devices or jax.device_count()
    mesh = make_mesh(num_devices=num_devices) if num_devices > 1 else None

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
        lr_scale=float(num_devices),  # reference's LR x world_size rule
    )
    trainer = EpochBasedTrainer(
        cfg,
        model,
        state,
        schedule,
        train_loader,
        valid_loader,
        mesh=mesh,
        snapshot_dir=snapshot_dir,
        log_file=osp.join(log_dir, "train.log"),
        log_steps=args.log_steps,
        seed=cfg.seed,
    )
    trainer.run(resume=args.resume)


def run_test(
    cfg,
    loader,
    snapshot_dir: str,
    snapshot_name: str,
    log_dir: str,
    after_test_step: Optional[Callable] = None,
    log_name: str = "test",
) -> dict:
    import jax

    from ref_geotransformer_tpu.engine import SingleTester, create_train_state
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer
    from ref_geotransformer_tpu.utils.common import ensure_dir

    ensure_dir(log_dir)
    model = GeoTransformer(cfg)
    pair0, _ = next(iter(loader.iter_single()))
    state, _ = create_train_state(model, ensure_pyramids(cfg, pair0), cfg.optim, steps_per_epoch=1)
    tester = SingleTester.from_snapshot(
        cfg,
        model,
        state,
        snapshot_dir,
        snapshot_name,
        loader.iter_single(),
        after_test_step=after_test_step,
        log_file=osp.join(log_dir, f"{log_name}.log"),
    )
    return tester.run()
