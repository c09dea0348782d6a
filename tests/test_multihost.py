"""Multi-host plumbing tests.

Fast tier: shard math (DistributedSampler analogue, incl. the wrap-padding
that keeps per-process batch counts equal), process-0 gating, the
single-process no-op of initialize_multihost, and --multihost parsing on
EVERY experiment trainval entry point.

Slow tier: a REAL 2-process run — two subprocesses join a localhost
coordinator via jax.distributed.initialize (CPU backend, 1 device each),
build process-disjoint loader shards, assemble a cross-process global batch
(make_array_from_process_local_data) and verify the jitted global metric is
identical on both processes, and that only process 0 performs the
primary-gated side effect. Reference behavior mirrored:
engine/base_trainer.py:66-78 (DDP init), utils/torch.py:48-77
(DistributedSampler incl. padding), engine/logger.py:29-33 (rank-0).
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

from ref_geotransformer_tpu.parallel.multihost import (
    initialize_multihost,
    is_primary,
    shard_spec,
)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _loader(n, num_shards, shard_index, shuffle=False, seed=0, batch_size=1):
    from ref_geotransformer_tpu.data.loader import PairLoader
    from tests.utils import tiny_config

    loader = PairLoader(
        _FakeDataset(n),
        tiny_config(),
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        num_shards=num_shards,
        shard_index=shard_index,
    )
    return loader


def test_shards_cover_dataset_with_equal_wraparound_lengths():
    """Every index lands in some shard; all shards have the SAME length
    (ceil, wrap-padded like the reference DistributedSampler) so multihost
    SPMD processes never diverge in batch count (deadlock otherwise)."""
    n, shards = 23, 4
    ceil_len = -(-n // shards)
    all_idx = []
    for s in range(shards):
        idx = _loader(n, shards, s)._indices()
        assert len(idx) == ceil_len
        all_idx.append(idx)
    merged = np.concatenate(all_idx)
    # covers the whole dataset; only the wrap-pad introduces duplicates
    np.testing.assert_array_equal(np.unique(merged), np.arange(n))
    assert len(merged) == ceil_len * shards


def test_shards_partition_under_shuffle_with_common_seed():
    """Shuffled shards still cover the dataset because every process permutes
    with the same seed (cfg.seed) before striding — the set_epoch contract."""
    n, shards = 40, 8  # divisible: no padding, exact partition
    all_idx = [_loader(n, shards, s, shuffle=True, seed=7)._indices() for s in range(shards)]
    merged = np.sort(np.concatenate(all_idx))
    np.testing.assert_array_equal(merged, np.arange(n))


def test_loader_len_equal_across_shards():
    n, shards, bs = 23, 4, 2
    lens = [len(_loader(n, shards, s, batch_size=bs)) for s in range(shards)]
    assert len(set(lens)) == 1  # equal per-process batch counts
    per_shard = -(-n // shards)  # 6 indices per shard after wrap-pad
    assert lens[0] == -(-per_shard // bs)  # 3 batches


def test_single_process_is_primary_and_initialize_noop():
    assert is_primary()
    assert shard_spec() == (1, 0)
    # no coordinator info in the env: must not raise, must report 1 process
    pidx, pcount = initialize_multihost()
    assert (pidx, pcount) == (0, 1)
    assert initialize_multihost() == (0, 1)  # idempotent


_ENTRY_POINTS = [
    "experiments/geotransformer_3dmatch_stage4/trainval.py",
    "experiments/geotransformer_kitti_stage5/trainval.py",
    "experiments/geotransformer_modelnet_rpmnet_stage4/trainval_encoder.py",
    "experiments/geotransformer_modelnet_rpmnet_stage4/train_cordi.py",
]


@pytest.mark.parametrize("entry", _ENTRY_POINTS)
def test_every_trainval_entry_point_parses_multihost(entry):
    """--multihost must parse on ALL experiment trainers (the reference's
    torch.distributed.launch contract applies uniformly, README.md:179).
    Checked by running `--help` and asserting the flag is advertised."""
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, entry), "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    assert "--multihost" in proc.stdout


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_execution(tmp_path):
    """jax.distributed.initialize actually executes: 2 CPU processes, one
    coordinator, disjoint shards, one global SPMD metric, rank-0 gating."""
    port = _free_port()
    gate_dir = tmp_path / "gate"
    gate_dir.mkdir()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"result_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            REF_GT_COORDINATOR=f"127.0.0.1:{port}",
            REF_GT_NUM_PROCESSES="2",
            REF_GT_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, osp.join(REPO, "tests", "_multihost_worker.py"),
                 str(out), str(gate_dir)],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        results.append(json.loads(out.read_text()))

    r0 = next(r for r in results if r["pidx"] == 0)
    r1 = next(r for r in results if r["pidx"] == 1)
    # both processes joined one 2-process runtime with a 2-device global mesh
    assert r0["pcount"] == r1["pcount"] == 2
    assert r0["n_devices_global"] == r1["n_devices_global"] == 2
    assert r0["n_devices_local"] == r1["n_devices_local"] == 1
    # rank-0 gating: exactly process 0 is primary, and exactly one side effect
    assert r0["is_primary"] and not r1["is_primary"]
    assert (gate_dir / "primary_side_effect.txt").read_text().startswith("written by process 0")
    # DistributedSampler analogue: equal lengths, full coverage (n=7 -> 4+4
    # with one wrap-pad duplicate)
    assert len(r0["indices"]) == len(r1["indices"]) == 4
    assert r0["loader_len"] == r1["loader_len"] == 2
    union = set(r0["indices"]) | set(r1["indices"])
    assert union == set(range(7))
    # the global batch spans both processes (2 local pairs x 2 processes)
    assert r0["global_batch_dim"] == r1["global_batch_dim"] == 4
    # cross-process metric equality: the jitted global mean is identical
    assert r0["metric"] == pytest.approx(r1["metric"], rel=0, abs=0)
