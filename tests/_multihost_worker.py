"""Worker process for the real 2-process multihost integration test
(tests/test_multihost.py). Launched with REF_GT_COORDINATOR /
REF_GT_NUM_PROCESSES / REF_GT_PROCESS_ID in the environment — the same
env:// contract a real cluster launch uses (reference
engine/base_trainer.py:66-78). Writes a JSON result blob to argv[1];
writes a primary-gated side-effect file under argv[2].

Everything here happens in the documented order: initialize_multihost()
FIRST (before any backend-initializing JAX call), then mesh/loader/step.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


class _SyntheticPairs:
    """Tiny deterministic pair dataset (no disk)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        rng = np.random.default_rng(i)
        return {
            "ref_points": rng.uniform(-1, 1, (50, 3)).astype(np.float32),
            "src_points": rng.uniform(-1, 1, (45, 3)).astype(np.float32),
            "transform": np.eye(4, dtype=np.float32),
        }


def main():
    out_path, gate_dir = sys.argv[1], sys.argv[2]

    # --- the call under test: must run before any other JAX API ---
    from ref_geotransformer_tpu.parallel.multihost import (
        initialize_multihost,
        is_primary,
        shard_spec,
    )

    pidx, pcount = initialize_multihost()

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ref_geotransformer_tpu.data.loader import PairLoader
    from ref_geotransformer_tpu.parallel.dp import shard_batch
    from tests.utils import tiny_config

    # primary gating side effect (the reference's rank-0 snapshot/log gate)
    if is_primary():
        with open(os.path.join(gate_dir, "primary_side_effect.txt"), "w") as f:
            f.write(f"written by process {pidx}\n")

    # DistributedSampler analogue: equal-length wrap-padded disjoint shards
    loader = PairLoader(
        _SyntheticPairs(7), tiny_config(), batch_size=2, shuffle=True, seed=3
    )
    assert shard_spec() == (pcount, pidx)
    loader.num_shards, loader.shard_index = shard_spec()
    indices = loader._indices()

    # one global SPMD computation over the cross-process mesh: every process
    # contributes its local batch; the jitted global mean must come back
    # identical on all processes (the all_reduce_tensors analogue).
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    batch = next(iter(loader))
    with mesh:
        global_batch = shard_batch(batch, mesh)
    n_global = global_batch["ref_points"].shape[0]

    @jax.jit
    def global_metric(b):
        # mean over the GLOBAL batch axis -> requires the cross-process array
        return jax.numpy.mean(b["ref_points"] ** 2) + jax.numpy.sum(b["_pair_masks"])

    metric = float(global_metric(global_batch))

    with open(out_path, "w") as f:
        json.dump(
            {
                "pidx": pidx,
                "pcount": pcount,
                "is_primary": bool(is_primary()),
                "n_devices_global": len(jax.devices()),
                "n_devices_local": len(jax.local_devices()),
                "indices": [int(i) for i in indices],
                "loader_len": len(loader),
                "global_batch_dim": int(n_global),
                "metric": metric,
            },
            f,
        )


if __name__ == "__main__":
    main()
