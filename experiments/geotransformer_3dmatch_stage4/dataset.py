"""Dataloader builders for the 3DMatch experiment.

Ref parity: experiments/geotransformer.3dmatch.../dataset.py:9-57 — but
loaders ship only padded raw clouds; the neighbor/pyramid precompute happens
on device inside the jitted step (no calibrate_neighbors at startup: the
calibrated limits are frozen in config, matching the reference's published
[38, 36, 36, 38]).
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from config import DATASET_ROOT

from ref_geotransformer_tpu.data import PairLoader
from ref_geotransformer_tpu.data.datasets import ThreeDMatchPairDataset


def train_valid_data_loader(cfg, batch_size=None, num_shards=1, shard_index=0):
    train_dataset = ThreeDMatchPairDataset(
        DATASET_ROOT,
        "train",
        point_limit=cfg.train.point_limit,
        use_augmentation=cfg.train.use_augmentation,
        augmentation_noise=cfg.train.augmentation_noise,
        augmentation_rotation=cfg.train.augmentation_rotation,
        seed=cfg.seed,
    )
    train_loader = PairLoader(
        train_dataset,
        cfg,
        batch_size=batch_size or cfg.train.batch_size,
        shuffle=True,
        drop_last=True,
        seed=cfg.seed,
        num_shards=num_shards,
        shard_index=shard_index,
    )
    valid_dataset = ThreeDMatchPairDataset(
        DATASET_ROOT,
        "val",
        point_limit=cfg.test.point_limit,
        use_augmentation=False,
        seed=cfg.seed,
    )
    valid_loader = PairLoader(valid_dataset, cfg, batch_size=batch_size or cfg.train.batch_size)
    return train_loader, valid_loader


def test_data_loader(cfg, benchmark: str, rotated: bool = False):
    test_dataset = ThreeDMatchPairDataset(
        DATASET_ROOT,
        benchmark,
        point_limit=cfg.test.point_limit,
        use_augmentation=False,
        rotated=rotated,
    )
    return PairLoader(test_dataset, cfg, batch_size=1)
