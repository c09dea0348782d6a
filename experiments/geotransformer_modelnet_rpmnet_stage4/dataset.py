"""Dataloaders for the modelnet/LineMod experiment.

Ref parity: experiments/geotransformer.modelnet.../dataset.py:11-39 — the
fork routes this experiment to LMODataset; the original ModelNet loaders are
kept available via use_modelnet=True.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from config import LINEMOD_ROOT, LMO, MODELNET, MODELNET_ROOT

from ref_geotransformer_tpu.data import PairLoader
from ref_geotransformer_tpu.data.datasets.linemod import LMODataset
from ref_geotransformer_tpu.data.datasets.modelnet import ModelNetPairDataset


def _linemod(cfg, mode):
    return LMODataset(
        LMO["data_folder"],
        reload_data=LMO["reload_data"],
        data_augmentation=LMO["data_augmentation"] and mode == "train",
        rotated=LMO["rotated"],
        rot_factor=LMO["rot_factor"],
        augment_noise=LMO["augment_noise"],
        points_limit=LMO["points_limit"],
        mode=mode,
        overfit=LMO["overfit"],
        seed=cfg.seed,
    )


def _modelnet(cfg, subset):
    return ModelNetPairDataset(
        MODELNET_ROOT,
        subset,
        num_points=MODELNET["num_points"],
        rotation_magnitude=MODELNET["rotation_magnitude"],
        translation_magnitude=MODELNET["translation_magnitude"],
        noise_magnitude=MODELNET["noise_magnitude"] if subset == "train" else None,
        keep_ratio=MODELNET["keep_ratio"],
        crop_method=MODELNET["crop_method"],
        asymmetric=MODELNET["asymmetric"],
        class_indices=MODELNET["class_indices"],
        deterministic=subset != "train",
        twice_sample=MODELNET["twice_sample"],
        twice_transform=MODELNET["twice_transform"],
        seed=cfg.seed,
    )


def train_valid_data_loader(cfg, batch_size=None, use_modelnet=False, num_shards=1, shard_index=0):
    make = _modelnet if use_modelnet else _linemod
    train_dataset = make(cfg, "train")
    valid_dataset = make(cfg, "val" if use_modelnet else "test")
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
    valid_loader = PairLoader(valid_dataset, cfg, batch_size=batch_size or cfg.train.batch_size)
    return train_loader, valid_loader


def test_data_loader(cfg, use_modelnet=False):
    make = _modelnet if use_modelnet else _linemod
    return PairLoader(make(cfg, "test"), cfg, batch_size=1)
