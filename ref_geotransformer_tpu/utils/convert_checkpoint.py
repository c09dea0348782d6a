"""Convert reference PyTorch checkpoints (.pth.tar state dicts) into this
framework's flax params/buffers.

The reference's module tree maps 1:1 onto ours (SURVEY.md §2.14); weight
layout differences:
  * torch Linear weight (out, in)  -> flax Dense kernel (in, out): transpose.
  * KPConv weights (K, Cin, Cout)  -> identical layout.
  * KPConv kernel_points buffer    -> 'buffers' collection (the reference
    randomizes dispositions per load, kernel_points.py:428-453, so the
    checkpoint's buffer is authoritative for parity).
  * GroupNorm weight/bias          -> MaskedGroupNorm scale/bias.
  * RPE proj_p Linear              -> proj_p_kernel/proj_p_bias (the q-side
    projection rewrite keeps the same (C, C) kernel, models/attention.py).
  * optimal_transport.alpha        -> scalar param.

Names: the reference prefixes with 'backbone.', 'transformer.', etc. and may
carry a DDP 'module.' prefix (engine/base_trainer.py:120-121).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_key_to_flax(key: str, value: np.ndarray):
    """Map one torch state-dict entry to (collection, path, array) or None to
    skip. `value` is a numpy array."""
    if key.startswith("module."):
        key = key[len("module."):]
    parts = key.split(".")

    # KPConv buffers
    if parts[-1] == "kernel_points":
        return "buffers", tuple(parts[:-1]) + ("kernel_points",), value

    # SinusoidalPositionalEmbedding.div_term is a deterministic function of
    # d_model (positional_embedding.py:14-17); we recompute it, never load it.
    if parts[-1] == "div_term":
        return None

    # sinkhorn alpha
    if parts[-1] == "alpha":
        return "params", tuple(parts[:-1]) + ("alpha",), value

    # KPConv conv weights keep layout
    if parts[-1] == "weights":
        return "params", tuple(parts[:-1]) + ("weights",), value

    # module lists: "layers.N" -> "layers_N" (one flax scope per layer)
    renamed = []
    for p in parts:
        if renamed and renamed[-1] == "layers" and p.isdigit():
            renamed[-1] = f"layers_{p}"
        else:
            renamed.append(p)
    parts = renamed

    name = parts[-1]
    module_path = tuple(parts[:-1])

    # RPE pairwise projection -> q-side rewrite params
    if len(module_path) > 0 and module_path[-1] == "proj_p":
        if name == "weight":
            return "params", module_path[:-1] + ("proj_p_kernel",), value.T
        if name == "bias":
            return "params", module_path[:-1] + ("proj_p_bias",), value

    # GroupNorm (reference nests nn.GroupNorm under .norm) / LayerNorm
    if name == "weight" and len(module_path) > 0 and module_path[-1] == "norm" and value.ndim == 1:
        return "params", module_path + ("scale",), value
    if name == "bias" and len(module_path) > 0 and module_path[-1] == "norm" and value.ndim == 1:
        return "params", module_path + ("bias",), value

    # nn.Embedding (check BEFORE the generic Linear branch: an embedding
    # table must keep (num_embeddings, dim) layout and flax's name
    # 'embedding', not a transposed 'kernel')
    if name == "weight" and value.ndim == 2 and module_path and module_path[-1] == "embeddings":
        return "params", module_path + ("embedding",), value

    # Linear
    if name == "weight" and value.ndim == 2:
        return "params", module_path + ("kernel",), value.T
    if name == "weight" and value.ndim == 1:  # LayerNorm elsewhere
        return "params", module_path + ("scale",), value
    if name == "bias":
        return "params", module_path + ("bias",), value

    return None


def convert_state_dict(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, Dict]:
    """torch state dict (tensor or ndarray values) -> {'params': ..., 'buffers': ...}."""
    params: Dict = {}
    buffers: Dict = {}
    skipped = []
    for key, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        mapped = torch_key_to_flax(key, arr)
        if mapped is None:
            skipped.append(key)
            continue
        collection, path, out = mapped
        # torch nests GroupNorm as <block>.norm.norm.{weight,bias}; flax uses
        # a single 'norm' module — collapse doubled 'norm' segments.
        path = tuple(_dedup_norm(path))
        _set(params if collection == "params" else buffers, path, out)
    return {"params": params, "buffers": buffers, "skipped": skipped}


def _dedup_norm(path):
    # torch nests its GroupNorm wrapper's inner nn.GroupNorm one level deeper
    # (kpconv/modules.py: UnaryBlock.norm.norm, ResidualBlock.norm_conv.norm);
    # our flax MaskedGroupNorm is a single module — collapse the inner 'norm'.
    out = []
    for p in path:
        if p == "norm" and out and out[-1] in ("norm", "norm_conv"):
            continue
        out.append(p)
    return out


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference .pth.tar and convert (requires torch-cpu)."""
    import torch

    snapshot = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = snapshot.get("model", snapshot)
    return convert_state_dict(state_dict)


_EXPERIMENTS = {
    "3dmatch": "geotransformer_3dmatch_stage4",
    "kitti": "geotransformer_kitti_stage5",
    "modelnet": "geotransformer_modelnet_rpmnet_stage4",
}


def _flat(tree, prefix=()):
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            yield from _flat(value, path)
        else:
            yield path, value


def _validate_against_experiment(converted: Dict, experiment: str) -> None:
    """Structural check: converted paths+shapes == a fresh model init's.

    Uses tiny init capacities (param shapes depend only on channel dims), so
    this is seconds on CPU. Raises SystemExit with a readable diff on
    mismatch rather than writing a snapshot the loaders would reject."""
    import os.path as osp
    import sys

    import jax
    import numpy as np

    repo = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    sys.path.insert(0, osp.join(repo, "experiments", _EXPERIMENTS[experiment]))
    from config import make_cfg  # noqa: E402

    from ref_geotransformer_tpu.models import GeoTransformer, init_model_variables

    cfg = make_cfg()
    model = GeoTransformer(cfg)
    init_vars = init_model_variables(model, cfg, jax.random.key(0))

    problems = []
    for collection in ("params", "buffers"):
        conv = dict(_flat(converted[collection]))
        exp = dict(_flat(init_vars.get(collection, {})))
        for path in sorted(set(exp) - set(conv)):
            problems.append(f"missing from checkpoint: {collection}/" + "/".join(path))
        for path in sorted(set(conv) - set(exp)):
            problems.append(f"not in this model: {collection}/" + "/".join(path))
        for path in sorted(set(conv) & set(exp)):
            if tuple(conv[path].shape) != tuple(np.shape(exp[path])):
                problems.append(
                    f"shape mismatch at {collection}/" + "/".join(path)
                    + f": checkpoint {tuple(conv[path].shape)} vs model {tuple(np.shape(exp[path]))}"
                )
    if problems:
        raise SystemExit(
            f"checkpoint does not match the '{experiment}' experiment model:\n  "
            + "\n  ".join(problems)
        )


def main() -> None:
    """CLI: reference .pth.tar -> orbax epoch snapshot loadable by this
    framework's test.py/demo.py --snapshot (engine/checkpoint.py layout).

        python -m ref_geotransformer_tpu.utils.convert_checkpoint \
            geotransformer-3dmatch.pth.tar output/snapshots --name epoch-40 \
            --experiment 3dmatch
    """
    import argparse
    import os.path as osp

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("checkpoint", help="reference PyTorch .pth.tar")
    parser.add_argument("snapshot_dir", help="output snapshot directory")
    parser.add_argument("--name", default=None,
                        help="snapshot name (default: checkpoint basename, e.g. epoch-40)")
    parser.add_argument("--experiment", choices=sorted(_EXPERIMENTS), default=None,
                        help="validate structure against this experiment's model before saving")
    args = parser.parse_args()

    converted = load_torch_checkpoint(args.checkpoint)
    n_params = sum(int(np.prod(leaf.shape)) for _, leaf in _flat(converted["params"]))
    print(f"converted {n_params:,} params; skipped (recomputed) keys: {converted['skipped']}")

    if args.experiment:
        _validate_against_experiment(converted, args.experiment)
        print(f"structure matches the '{args.experiment}' model")

    from ref_geotransformer_tpu.engine.checkpoint import CheckpointManager

    name = args.name or osp.basename(args.checkpoint).split(".")[0]
    CheckpointManager(args.snapshot_dir).save_epoch(name, converted["params"], converted["buffers"])
    print(f"saved {osp.join(osp.abspath(args.snapshot_dir), name)}")


if __name__ == "__main__":
    main()
