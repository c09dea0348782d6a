"""Per-epoch feature-directory evaluation sweep.

Ref parity: experiments/geotransformer.3dmatch.../eval_dgr.py's role — run
the offline evaluation over a set of feature dirs (one per tested epoch, as
produced by `test.py --snapshot epoch-N` into features/<benchmark>) and
report the best epoch. Shares all metric code with eval.py.

Usage: python eval_dgr.py --benchmark 3DMatch --method lgr --epochs 20 40
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from types import SimpleNamespace

from config import FEATURE_DIR, make_cfg
from eval import eval_one_epoch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", choices=["3DMatch", "3DLoMatch", "val"], default="3DMatch")
    parser.add_argument("--method", choices=["lgr", "svd", "ransac"], default="lgr")
    parser.add_argument("--epochs", type=int, nargs=2, default=[20, 40], help="inclusive epoch range")
    parser.add_argument("--num_corr", type=int, default=None)
    args = parser.parse_args()
    cfg = make_cfg()

    best = None
    for epoch in range(args.epochs[0], args.epochs[1] + 1):
        feature_dir = osp.join(FEATURE_DIR, f"{args.benchmark}-epoch-{epoch}")
        if not osp.isdir(feature_dir):
            continue
        sub_args = SimpleNamespace(
            benchmark=args.benchmark, feature_dir=feature_dir, method=args.method,
            num_corr=args.num_corr, verbose=False,
        )
        summary = eval_one_epoch(sub_args, cfg)
        print(f"epoch {epoch}: " + str({k: round(v, 4) for k, v in summary.items()}))
        if best is None or summary["RR"] > best[1]["RR"]:
            best = (epoch, summary)
    if best is not None:
        print(f"best epoch {best[0]}: RR {best[1]['RR']:.4f}")
    else:
        print("no per-epoch feature dirs found; run test.py with --snapshot epoch-N first")


if __name__ == "__main__":
    main()
