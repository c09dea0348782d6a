"""KITTI test: dump per-pair .npz + online metrics.

Ref parity: kitti experiment test.py (RR criterion RRE < 5 deg, RTE < 2 m is
applied by the online evaluator via cfg.eval.recall_criterion='rre_rte';
the dump carries the full key set of the reference's test.py:65-80 so
eval.py can score coarse matching too).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--snapshot", required=True, help="epoch snapshot name (e.g. epoch-160)")
    args = parser.parse_args()

    from config import FEATURE_DIR, LOG_DIR, SNAPSHOT_DIR, make_cfg
    from dataset import test_data_loader
    from ref_geotransformer_tpu.engine.cli import run_test
    from ref_geotransformer_tpu.utils.common import ensure_dir
    from ref_geotransformer_tpu.utils.feature_dump import dump_registration_npz

    cfg = make_cfg()
    ensure_dir(FEATURE_DIR)
    loader = test_data_loader(cfg)

    def after_test_step(i, data, meta, output):
        dump_registration_npz(FEATURE_DIR, data, meta, output)

    summary = run_test(
        cfg, loader, SNAPSHOT_DIR, args.snapshot, LOG_DIR, after_test_step=after_test_step, log_name="test"
    )
    print({k: round(v, 4) for k, v in summary.items()})


if __name__ == "__main__":
    main()
