"""KITTI training entry point (ref parity: kitti experiment trainval.py)."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    from ref_geotransformer_tpu.engine.cli import (
        maybe_initialize_multihost,
        run_trainval,
        trainval_parser,
    )

    args = trainval_parser().parse_args()
    maybe_initialize_multihost(args)  # must precede any other JAX call

    import jax

    from config import LOG_DIR, SNAPSHOT_DIR, make_cfg
    from dataset import train_valid_data_loader

    cfg = make_cfg()
    num_devices = args.num_devices or jax.device_count()
    batch_size = args.batch_size or max(cfg.train.batch_size, num_devices)
    train_loader, valid_loader = train_valid_data_loader(cfg, batch_size=batch_size)
    run_trainval(cfg, train_loader, valid_loader, SNAPSHOT_DIR, LOG_DIR, args)


if __name__ == "__main__":
    main()
