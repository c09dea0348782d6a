"""Phase-1 training: GeoTransformer encoder on LineMod (iteration-based).

Ref parity: experiments/geotransformer.modelnet.../trainval_encoder.py:21-67
— IterBasedEncoderTrainer, warmup-cosine LR (10k warmup / 100k iters),
snapshot + truncated validation every 2000 iterations.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    from ref_geotransformer_tpu.engine.cli import (
        apply_loader_sharding,
        iter_trainval_parser,
        maybe_initialize_multihost,
    )

    args = iter_trainval_parser().parse_args()
    maybe_initialize_multihost(args)  # must precede any other JAX call

    import jax
    import optax

    from config import LOG_DIR, SNAPSHOT_ENCODER_DIR, make_cfg
    from dataset import train_valid_data_loader
    from ref_geotransformer_tpu.engine.iter_trainer import IterBasedEncoderTrainer, make_warmup_cosine_schedule
    from ref_geotransformer_tpu.engine.state import TrainState, guard_nonfinite
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer, init_model_variables
    from ref_geotransformer_tpu.utils.common import ensure_dir

    cfg = make_cfg()
    ensure_dir(SNAPSHOT_ENCODER_DIR)
    ensure_dir(LOG_DIR)

    max_iteration = args.max_iteration or cfg.optim.max_iteration
    train_loader, valid_loader = train_valid_data_loader(
        cfg, batch_size=args.batch_size or 1, use_modelnet=args.use_modelnet
    )
    apply_loader_sharding(args, train_loader, valid_loader)

    model = GeoTransformer(cfg)
    variables = init_model_variables(model, cfg, jax.random.key(cfg.seed))
    schedule = make_warmup_cosine_schedule(
        cfg.optim.lr, max_iteration, cfg.optim.warmup_steps, cfg.optim.eta_init, cfg.optim.eta_min
    )
    tx = guard_nonfinite(optax.adamw(schedule, weight_decay=cfg.optim.weight_decay))
    import jax.numpy as jnp

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )

    trainer = IterBasedEncoderTrainer(
        cfg,
        model,
        state,
        schedule,
        train_loader,
        valid_loader,
        max_iteration=max_iteration,
        snapshot_steps=args.snapshot_steps or cfg.optim.snapshot_steps,
        log_steps=args.log_steps,
        snapshot_dir=SNAPSHOT_ENCODER_DIR,
        log_file=osp.join(LOG_DIR, "train_encoder.log"),
        seed=cfg.seed,
    )
    trainer.run(resume=args.resume)


if __name__ == "__main__":
    main()
