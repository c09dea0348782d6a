"""LineMod/ModelNet test: encoder metrics (RRE/RTE/RR with the ModelNet
acceptance RRE<1deg, RTE<0.1) and optional Cordi sampling metrics.

Ref parity: experiments/geotransformer.modelnet.../test.py + the DDPM val
path of engine/iter_based_trainer.py:284-320.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--snapshot", required=True, help="encoder snapshot (e.g. iter-100000)")
    parser.add_argument("--cordi_snapshot", default=None, help="cordi snapshot to also evaluate")
    parser.add_argument("--use_modelnet", action="store_true")
    parser.add_argument("--num_pairs", type=int, default=None, help="cap evaluated pairs")
    args = parser.parse_args()

    import itertools

    import jax
    import jax.numpy as jnp

    from config import DDPM, LOG_DIR, SNAPSHOT_DDPM_DIR, SNAPSHOT_ENCODER_DIR, make_cfg
    from dataset import test_data_loader
    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager
    from ref_geotransformer_tpu.engine.iter_trainer import evaluate_ddpm
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids, make_forward_fn
    from ref_geotransformer_tpu.models import Cordi, GeoTransformer, init_model_variables
    from ref_geotransformer_tpu.models.cordi import cordi_downsample
    from ref_geotransformer_tpu.models.losses import evaluate
    from ref_geotransformer_tpu.utils.summary_board import SummaryBoard

    cfg = make_cfg()
    loader = test_data_loader(cfg, use_modelnet=args.use_modelnet)

    encoder = GeoTransformer(cfg)
    variables = init_model_variables(encoder, cfg, jax.random.key(cfg.seed))
    ckpt = CheckpointManager(SNAPSHOT_ENCODER_DIR)
    restored = ckpt.load_model(args.snapshot, variables["params"], variables["buffers"])
    params, buffers = restored["params"], restored["buffers"]
    forward = make_forward_fn(encoder, cfg)

    cordi = None
    cordi_params = None
    if args.cordi_snapshot:
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
        cvars = jax.jit(cordi.init)(jax.random.key(0), x0, ctx)
        dckpt = CheckpointManager(SNAPSHOT_DDPM_DIR)
        cordi_params = dckpt.load_model(args.cordi_snapshot, cvars["params"], {})["params"]

        sample_fn = jax.jit(
            lambda p, x_t, c, r: cordi.apply({"params": p}, x_t, c, r, method=Cordi.sample)
        )

    board = SummaryBoard(adaptive=True)
    rng = jax.random.key(123)
    pairs = loader.iter_single()
    if args.num_pairs:
        pairs = itertools.islice(pairs, args.num_pairs)
    for i, (pair, meta) in enumerate(pairs):
        out = forward(params, buffers, pair)
        metrics = jax.device_get(evaluate(out, jnp.asarray(pair["transform"]), cfg.eval))
        board.update_from_result_dict(metrics)
        if cordi is not None:
            rng, d_rng, s_rng = jax.random.split(rng, 3)
            d = cordi_downsample(d_rng, out, DDPM.ref_sample_num, DDPM.src_sample_num)
            pred = sample_fn(cordi_params, d["init_corr_matrix"][None], d["feat_matrix"][None], s_rng)
            ddpm_metrics = evaluate_ddpm(
                np.asarray(pred[0]), np.asarray(d["gt_corr_matrix"]), np.asarray(d["init_corr_matrix"])
            )
            board.update_from_result_dict({f"ddpm_{k}": v for k, v in ddpm_metrics.items()})
    print({k: round(v, 4) for k, v in board.summary().items()})


if __name__ == "__main__":
    main()
