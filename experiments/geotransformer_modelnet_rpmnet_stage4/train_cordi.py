"""Phase-2 training: Cordi DDPM over a frozen pretrained encoder.

Ref parity: experiments/geotransformer.modelnet.../train_cordi.py:22-74 —
load the encoder snapshot, per iteration run it frozen over ddpm.batch_size
pairs to build the latent batch, take one diffusion epsilon-loss step;
validation = encoder -> Cordi.sample -> DDPMEvaluator (PIR@32/16/8, IIR).
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

    parser = iter_trainval_parser()
    parser.add_argument("--encoder_snapshot", default=None, help="encoder snapshot name (e.g. iter-100000)")
    args = parser.parse_args()
    maybe_initialize_multihost(args)  # must precede any other JAX call

    import jax
    import jax.numpy as jnp
    import optax

    from config import DDPM, LOG_DIR, SNAPSHOT_DDPM_DIR, SNAPSHOT_ENCODER_DIR, make_cfg
    from dataset import train_valid_data_loader
    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
    from ref_geotransformer_tpu.engine.iter_trainer import IterBasedDDPMTrainer, make_warmup_cosine_schedule
    from ref_geotransformer_tpu.engine.state import TrainState, guard_nonfinite
    from ref_geotransformer_tpu.models import Cordi, GeoTransformer, init_model_variables
    from ref_geotransformer_tpu.utils.common import ensure_dir

    cfg = make_cfg()
    ensure_dir(SNAPSHOT_DDPM_DIR)
    ensure_dir(LOG_DIR)
    max_iteration = args.max_iteration or cfg.optim.max_iteration

    train_loader, valid_loader = train_valid_data_loader(cfg, batch_size=1, use_modelnet=args.use_modelnet)
    apply_loader_sharding(args, train_loader, valid_loader)

    # frozen encoder
    encoder = GeoTransformer(cfg)
    enc_vars = init_model_variables(encoder, cfg, jax.random.key(cfg.seed))
    encoder_params, encoder_buffers = enc_vars["params"], enc_vars["buffers"]
    if args.encoder_snapshot:
        ckpt = CheckpointManager(SNAPSHOT_ENCODER_DIR)
        restored = ckpt.load_model(args.encoder_snapshot, encoder_params, encoder_buffers)
        encoder_params, encoder_buffers = restored["params"], restored["buffers"]
        print(f"loaded encoder snapshot {args.encoder_snapshot}")

    # cordi model
    cordi = Cordi(
        ref_sample_num=DDPM.ref_sample_num,
        src_sample_num=DDPM.src_sample_num,
        num_steps=DDPM.num_steps,
        beta_1=DDPM.beta_1,
        beta_T=DDPM.beta_T,
        time_emb_dim=DDPM.time_emb_dim,
        n_layers=DDPM.n_layers,
        n_heads=DDPM.n_heads,
        query_dimensions=DDPM.query_dimensions,
        feed_forward_dimensions=DDPM.feed_forward_dimensions,
        activation=DDPM.activation,
    )
    x0 = jnp.zeros((1, DDPM.ref_sample_num, DDPM.src_sample_num))
    ctx = jnp.zeros((1, DDPM.ref_sample_num, DDPM.src_sample_num, 2 * cfg.geotransformer.output_dim))
    cordi_vars = jax.jit(cordi.init)(jax.random.key(cfg.seed + 1), x0, ctx)

    schedule = make_warmup_cosine_schedule(
        cfg.optim.lr, max_iteration, cfg.optim.warmup_steps, cfg.optim.eta_init, cfg.optim.eta_min
    )
    tx = guard_nonfinite(optax.adamw(schedule, weight_decay=cfg.optim.weight_decay))
    cordi_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=cordi_vars["params"],
        buffers={},
        opt_state=tx.init(cordi_vars["params"]),
        tx=tx,
    )

    trainer = IterBasedDDPMTrainer(
        cfg,
        encoder,
        encoder_params,
        encoder_buffers,
        cordi,
        cordi_state,
        schedule,
        train_loader,
        valid_loader,
        max_iteration=max_iteration,
        snapshot_steps=args.snapshot_steps or cfg.optim.snapshot_steps,
        log_steps=args.log_steps,
        ddpm_batch_size=DDPM.batch_size,
        snapshot_dir=SNAPSHOT_DDPM_DIR,
        log_file=osp.join(LOG_DIR, "train_cordi.log"),
        seed=cfg.seed,
    )
    trainer.run(resume=args.resume)


if __name__ == "__main__":
    main()
