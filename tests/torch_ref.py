"""Load the reference PyTorch implementation for cross-implementation
numerical parity tests (tests/test_torch_parity.py).

The reference lives read-only at /root/reference; torch-CPU is installed in
this sandbox, so we can instantiate its modules with random weights, convert
the state dict with utils/convert_checkpoint.py, and assert both
implementations compute the same function on identical inputs.

Stubbed imports (never exercised by the parity tests):
  * geotransformer.ext       — compiled CPU extension; only the data pipeline
    (grid_subsample / radius_search) needs it, and parity tests feed
    precomputed neighbor tables from OUR pipeline to both implementations.
  * open3d                   — used for visualization and for reading the
    kernel-disposition PLY; the stub implements just enough of
    io.read_point_cloud to parse the binary PLY shipped with the reference
    (modules/kpconv/dispositions/k_015_center_3D.ply).
  * ipdb                     — debugger import in circle_loss.py/procrustes.py.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
EXP_3DMATCH = os.path.join(
    REF_ROOT, "experiments", "geotransformer.3dmatch.stage4.gse.k3.max.oacl.stage2.sinkhorn"
)


def _read_binary_ply_xyz(path: str) -> np.ndarray:
    """Minimal reader for the reference's kernel-disposition PLY
    (binary_little_endian, float64 x/y/z vertices)."""
    with open(path, "rb") as f:
        data = f.read()
    marker = b"end_header\n"
    header_end = data.index(marker) + len(marker)
    header = data[:header_end].decode("ascii")
    assert "binary_little_endian" in header, f"unexpected PLY format in {path}"
    n = int(
        next(line.split()[-1] for line in header.splitlines() if line.startswith("element vertex"))
    )
    return np.frombuffer(data, dtype="<f8", count=n * 3, offset=header_end).reshape(n, 3).copy()


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    if "geotransformer.ext" not in sys.modules:
        ext = _stub_module("geotransformer.ext")

        def _unavailable(*args, **kwargs):
            raise RuntimeError(
                "geotransformer.ext is stubbed: parity tests precompute neighbor tables"
            )

        ext.grid_subsampling = _unavailable
        ext.radius_neighbors = _unavailable

    if "ipdb" not in sys.modules:
        try:
            importlib.import_module("ipdb")
        except ImportError:
            _stub_module("ipdb").set_trace = lambda *a, **k: None

    if "open3d" not in sys.modules:
        try:
            importlib.import_module("open3d")
        except ImportError:
            o3d = _stub_module("open3d")
            geometry = _stub_module("open3d.geometry")
            utility = _stub_module("open3d.utility")
            io = _stub_module("open3d.io")

            class PointCloud:
                def __init__(self):
                    self.points = np.zeros((0, 3))

            def read_point_cloud(path):
                pcd = PointCloud()
                pcd.points = _read_binary_ply_xyz(path)
                return pcd

            def write_point_cloud(path, pcd):
                raise RuntimeError("open3d stub: refusing to write into the read-only reference")

            geometry.PointCloud = PointCloud
            utility.Vector3dVector = np.asarray
            io.read_point_cloud = read_point_cloud
            io.write_point_cloud = write_point_cloud
            o3d.geometry = geometry
            o3d.utility = utility
            o3d.io = io


def ref_modules():
    """Import and return the reference `geotransformer.modules` package."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_stubs()
    # the reference hard-codes .cuda() in a few modules (e.g.
    # sinkhorn/learnable_sinkhorn.py:34-58); torch here is CPU-only, so make
    # .cuda() an identity — no math changes.
    import torch

    torch.Tensor.cuda = lambda self, *args, **kwargs: self
    import geotransformer.modules as modules  # noqa: PLC0415

    return modules


def ref_experiment():
    """Import the reference 3DMatch experiment's model.py/backbone.py
    (experiments/geotransformer.3dmatch.../model.py:19-212)."""
    return ref_experiment_variant("3dmatch")


_EXP_DIRS = {
    "3dmatch": "geotransformer.3dmatch.stage4.gse.k3.max.oacl.stage2.sinkhorn",
    "kitti": "geotransformer.kitti.stage5.gse.k3.max.oacl.stage2.sinkhorn",
    "modelnet": "geotransformer.modelnet.rpmnet.stage4.gse.k3.max.oacl.stage2.sinkhorn",
}


def ref_experiment_variant(name: str):
    """Import one reference experiment's model module. All three experiment
    dirs use the colliding top-level module names `model`/`backbone`, so evict
    any previously imported pair and pin sys.path to the requested dir."""
    ref_modules()
    exp_dir = os.path.join(REF_ROOT, "experiments", _EXP_DIRS[name])
    for colliding in ("model", "backbone"):
        mod = sys.modules.get(colliding)
        if mod is not None and getattr(mod, "__file__", "") != os.path.join(exp_dir, f"{colliding}.py"):
            del sys.modules[colliding]
    for other in _EXP_DIRS.values():
        p = os.path.join(REF_ROOT, "experiments", other)
        if p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, exp_dir)
    return importlib.import_module("model")


class NS(types.SimpleNamespace):
    """Attribute-dict config shim (replaces easydict, which isn't installed;
    the reference experiment config.py also writes output dirs into the
    read-only tree, so we construct the cfg directly)."""


def make_parity_cfg():
    """Scaled-down 3DMatch stage-4 hyperparameters shared by both
    implementations (values mirror experiments/geotransformer.3dmatch.../
    config.py:63-121; dims shrunk for CPU speed, structure identical)."""
    cfg = NS()
    cfg.model = NS(
        ground_truth_matching_radius=0.05,
        num_points_in_patch=16,
        num_sinkhorn_iterations=100,
    )
    cfg.backbone = NS(
        num_stages=4,
        init_voxel_size=0.025,
        kernel_size=15,
        base_radius=2.5,
        base_sigma=2.0,
        init_radius=0.0625,
        init_sigma=0.05,
        group_norm=8,
        input_dim=1,
        init_dim=16,
        output_dim=64,
    )
    cfg.geotransformer = NS(
        input_dim=256,
        hidden_dim=64,
        output_dim=128,
        num_heads=4,
        blocks=["self", "cross", "self", "cross", "self", "cross"],
        sigma_d=0.2,
        sigma_a=15,
        angle_k=3,
        reduction_a="max",
    )
    cfg.coarse_matching = NS(
        num_targets=32,
        overlap_threshold=0.1,
        num_correspondences=48,
        dual_normalization=True,
    )
    cfg.fine_matching = NS(
        topk=3,
        acceptance_radius=0.1,
        mutual=True,
        confidence_threshold=0.05,
        use_dustbin=False,
        use_global_score=False,
        correspondence_threshold=3,
        correspondence_limit=None,
        num_refinement_steps=5,
    )
    return cfg


def stacked_data_from_ours(data, transform) -> dict:
    """Convert OUR padded per-cloud pyramid dict into the reference's
    stack-mode data_dict (utils/data.py:143-193 layout): per level, points are
    [ref_valid; src_valid] concatenated, lengths = [n_ref, n_src], neighbor
    tables remapped (our per-cloud sentinel == capacity becomes the stacked
    shadow index == total valid count at the support level).

    Feeding our tables to BOTH implementations guarantees identical inputs, so
    any output disagreement is model math, not pipeline differences.
    """
    import torch

    ref, src = data["ref"], data["src"]
    num_levels = len(ref["points"])
    nr = [int(np.asarray(m).sum()) for m in ref["masks"]]
    ns = [int(np.asarray(m).sum()) for m in src["masks"]]

    out = {"points": [], "lengths": [], "neighbors": [], "subsampling": [], "upsampling": []}
    for i in range(num_levels):
        pr = np.asarray(ref["points"][i])[: nr[i]]
        ps = np.asarray(src["points"][i])[: ns[i]]
        out["points"].append(torch.from_numpy(np.concatenate([pr, ps], axis=0)))
        out["lengths"].append(torch.tensor([nr[i], ns[i]], dtype=torch.int64))

    def remap(tbl_ref, tbl_src, q_level, s_level):
        tr = np.asarray(tbl_ref)[: nr[q_level]].astype(np.int64)
        ts = np.asarray(tbl_src)[: ns[q_level]].astype(np.int64)
        # our convention: real neighbors index compacted valid rows
        # (< count); empty slots hold sentinel == support capacity
        cap_r = np.asarray(ref["points"][s_level]).shape[0]
        cap_s = np.asarray(src["points"][s_level]).shape[0]
        assert np.all((tr < nr[s_level]) | (tr == cap_r)), "ref neighbor table has stray indices"
        assert np.all((ts < ns[s_level]) | (ts == cap_s)), "src neighbor table has stray indices"
        shadow = nr[s_level] + ns[s_level]
        mr = np.where(tr < nr[s_level], tr, shadow)
        ms = np.where(ts < ns[s_level], ts + nr[s_level], shadow)
        return torch.from_numpy(np.concatenate([mr, ms], axis=0))

    for i in range(num_levels):
        out["neighbors"].append(remap(ref["neighbors"][i], src["neighbors"][i], i, i))
        if i < num_levels - 1:
            out["subsampling"].append(
                remap(ref["subsampling"][i], src["subsampling"][i], i + 1, i)
            )
            out["upsampling"].append(remap(ref["upsampling"][i], src["upsampling"][i], i, i + 1))

    out["features"] = torch.ones((nr[0] + ns[0], 1), dtype=torch.float32)
    out["transform"] = torch.from_numpy(np.asarray(transform, np.float32))
    return out


def torch_state_to_variables(module) -> dict:
    """Reference nn.Module random-init state dict -> our flax variables."""
    from ref_geotransformer_tpu.utils.convert_checkpoint import convert_state_dict

    converted = convert_state_dict(module.state_dict())
    bad = [k for k in converted["skipped"] if not k.endswith("div_term")]
    assert not bad, f"unmapped torch keys: {bad}"
    out = {"params": converted["params"]}
    if converted["buffers"]:
        out["buffers"] = converted["buffers"]
    return out


def flat_paths(tree, prefix=()):
    """Yield (path, leaf) pairs of a nested dict tree."""
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            yield from flat_paths(value, path)
        else:
            yield path, value


def assert_tree_shapes_match(converted: dict, expected: dict, collection: str) -> None:
    """Diagnostic structural comparison between a converted torch tree and
    our init variables: same paths, same shapes."""
    conv = dict(flat_paths(converted))
    exp = dict(flat_paths(expected))
    missing = sorted(set(exp) - set(conv))
    extra = sorted(set(conv) - set(exp))
    assert not missing and not extra, (
        f"{collection} tree mismatch\n  missing from conversion: {missing}\n  extra: {extra}"
    )
    for path, leaf in exp.items():
        assert tuple(conv[path].shape) == tuple(np.shape(leaf)), (
            f"{collection} shape mismatch at {path}: torch {conv[path].shape} vs flax {np.shape(leaf)}"
        )
