"""Loader / packing / calibration tests (host-side, fast)."""

import numpy as np
import pytest

from ref_geotransformer_tpu.data import PairLoader, pack_pair, calibrate_capacities, calibrate_neighbor_limits
from tests.utils import tiny_config


class FakeDataset:
    def __init__(self, n=7, seed=0):
        self.rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            n_ref = int(self.rng.integers(100, 300))
            n_src = int(self.rng.integers(100, 300))
            self.items.append(
                {
                    "scene_name": f"scene{i}",
                    "ref_frame": i,
                    "src_frame": i + 1,
                    "overlap": 0.5,
                    "ref_points": self.rng.uniform(-1, 1, (n_ref, 3)).astype(np.float32),
                    "src_points": self.rng.uniform(-1, 1, (n_src, 3)).astype(np.float32),
                    "transform": np.eye(4, dtype=np.float32),
                }
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_pack_pair_shapes():
    ds = FakeDataset()
    packed = pack_pair(ds[0], 512)
    assert packed["ref_points"].shape == (512, 3)
    assert packed["ref_masks"].sum() == ds[0]["ref_points"].shape[0]
    assert packed["transform"].shape == (4, 4)


def test_loader_batches():
    cfg = tiny_config()
    ds = FakeDataset()
    loader = PairLoader(ds, cfg, batch_size=2, shuffle=True, drop_last=False, seed=1)
    batches = list(loader)
    assert len(batches) == 4  # ceil(7/2), last repeat-padded
    for b in batches:
        assert b["ref_points"].shape == (2, cfg.capacities.points[0], 3)
        assert b["transform"].shape == (2, 4, 4)


def test_loader_sharding_partition():
    cfg = tiny_config()
    ds = FakeDataset(n=8)
    seen = []
    for shard in range(2):
        loader = PairLoader(ds, cfg, batch_size=1, num_shards=2, shard_index=shard, prefetch=0)
        seen.append({int(b["ref_masks"][0].sum()) for b in loader})
    # shards are disjoint by index; masks-sum is a proxy identity here
    assert len(list(PairLoader(ds, cfg, batch_size=1, num_shards=2, shard_index=0, prefetch=0))) == 8 // 2


def test_iter_single_meta():
    cfg = tiny_config()
    ds = FakeDataset()
    loader = PairLoader(ds, cfg, batch_size=1)
    pair, meta = next(iter(loader.iter_single()))
    assert meta["scene_name"] == "scene0"
    assert pair["ref_points"].ndim == 2


@pytest.mark.slow
def test_calibration_tools():
    ds = FakeDataset(n=3)
    caps = calibrate_capacities(ds, num_stages=3, voxel_size=0.05, num_samples=3, align=64)
    assert len(caps) == 3
    assert caps[0] >= 300
    assert caps[0] >= caps[1] >= caps[2]

    limits = calibrate_neighbor_limits(
        ds, num_stages=3, voxel_size=0.05, search_radius=0.125, capacities=caps, num_samples=2, max_limit=48
    )
    assert len(limits) == 3
    assert all(1 <= l <= 48 for l in limits)
