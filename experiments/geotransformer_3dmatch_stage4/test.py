"""3DMatch/3DLoMatch test: run the model over the benchmark split and dump
per-pair .npz feature/correspondence files for offline eval.

Ref parity: experiments/geotransformer.3dmatch.../test.py:65-102 (two-phase
test/eval protocol; eval.py consumes the dumps). Padded slots are stripped
before dumping so the .npz contents look exactly like the reference's.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", choices=["3DMatch", "3DLoMatch", "val"], default="3DMatch")
    parser.add_argument("--snapshot", required=True, help="epoch snapshot name (e.g. epoch-40)")
    parser.add_argument("--rotated", action="store_true", help="rotated benchmark variant (dataset.py:114-122)")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from config import FEATURE_DIR, LOG_DIR, SNAPSHOT_DIR, make_cfg
    from dataset import test_data_loader
    from ref_geotransformer_tpu.engine import SingleTester, create_train_state
    from ref_geotransformer_tpu.engine.steps import ensure_pyramids
    from ref_geotransformer_tpu.models import GeoTransformer
    from ref_geotransformer_tpu.utils.common import ensure_dir

    cfg = make_cfg()
    feature_dir = osp.join(FEATURE_DIR, args.benchmark)
    ensure_dir(feature_dir)
    ensure_dir(LOG_DIR)

    loader = test_data_loader(cfg, args.benchmark, rotated=args.rotated)
    model = GeoTransformer(cfg)

    pair0, _ = next(iter(loader.iter_single()))
    state, _ = create_train_state(model, ensure_pyramids(cfg, pair0), cfg.optim, steps_per_epoch=1)

    from ref_geotransformer_tpu.utils.feature_dump import dump_registration_npz

    def after_test_step(i, data, meta, output):
        dump_registration_npz(feature_dir, data, meta, output)

    tester = SingleTester.from_snapshot(
        cfg,
        model,
        state,
        SNAPSHOT_DIR,
        args.snapshot,
        loader.iter_single(),
        after_test_step=after_test_step,
        log_file=osp.join(LOG_DIR, f"test-{args.benchmark}.log"),
    )
    summary = tester.run()
    print({k: round(v, 4) for k, v in summary.items()})


if __name__ == "__main__":
    main()
