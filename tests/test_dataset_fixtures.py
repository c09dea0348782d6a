"""Real-format dataset ingestion tests on synthesized miniature fixtures.

Each of the four dataset readers is exercised through its actual on-disk
format (torch .pth fragments, KITTI .npy scans, ModelNet pkl, a BOP/LineMod
scene tree with 16-bit depth PNGs), proving the `__getitem__` paths work on
files shaped exactly like the real downloads (reference formats:
datasets/registration/threedmatch/dataset.py:52-66, kitti/dataset.py,
modelnet.py, linemod/linemod.py:143-185)."""

import json
import os.path as osp
import pickle

import numpy as np
import pytest


def _apply(points, transform):
    return points @ transform[:3, :3].T + transform[:3, 3]


def _random_transform(rng):
    from scipy.spatial.transform import Rotation

    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rotation.from_euler("xyz", rng.uniform(-40, 40, 3), degrees=True).as_matrix()
    t[:3, 3] = rng.uniform(-0.3, 0.3, 3)
    return t


def _check_pair_schema(sample, check_alignment=True, atol=0.02):
    for key in ("ref_points", "src_points", "ref_feats", "src_feats", "transform"):
        assert key in sample, f"missing {key}"
    assert sample["ref_points"].dtype == np.float32
    assert sample["transform"].shape == (4, 4)
    assert sample["ref_feats"].shape == (sample["ref_points"].shape[0], 1)
    if check_alignment:
        # fixtures are built with exact correspondence ref == T(src): the
        # reader's augmentation must keep the GT transform consistent
        aligned = _apply(sample["src_points"], sample["transform"])
        nearest = np.min(
            np.linalg.norm(sample["ref_points"][None, :, :] - aligned[:, None, :], axis=-1), axis=1
        )
        assert float(np.median(nearest)) < atol, "GT transform inconsistent with clouds"


# ---------------------------------------------------------------------------
# 3DMatch: torch-saved .pth fragments + metadata pkl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def threedmatch_root(tmp_path_factory):
    torch = pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("threedmatch")
    scene = "7-scenes-fixture"
    (root / "metadata").mkdir()
    (root / "data" / "train" / scene).mkdir(parents=True)

    rng = np.random.default_rng(0)
    metadata = []
    for frag0, frag1 in [(0, 1), (2, 3)]:
        transform = _random_transform(rng)
        ref = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        src = _apply(ref, np.linalg.inv(transform)).astype(np.float32)
        pcd0 = f"train/{scene}/cloud_bin_{frag0}.pth"
        pcd1 = f"train/{scene}/cloud_bin_{frag1}.pth"
        torch.save(torch.from_numpy(ref), str(root / "data" / pcd0))
        torch.save(torch.from_numpy(src), str(root / "data" / pcd1))
        metadata.append(
            {
                "scene_name": scene,
                "frag_id0": frag0,
                "frag_id1": frag1,
                "overlap": 0.8,
                "rotation": transform[:3, :3],
                "translation": transform[:3, 3],
                "pcd0": pcd0,
                "pcd1": pcd1,
            }
        )
    with open(root / "metadata" / "train.pkl", "wb") as f:
        pickle.dump(metadata, f)
    return str(root)


def test_threedmatch_getitem(threedmatch_root):
    from ref_geotransformer_tpu.data.datasets.threedmatch import ThreeDMatchPairDataset

    ds = ThreeDMatchPairDataset(
        threedmatch_root, "train", point_limit=256, use_augmentation=True, seed=0,
        overlap_threshold=0.5,
    )
    assert len(ds) == 2
    sample = ds[0]
    assert sample["ref_points"].shape[0] <= 256
    _check_pair_schema(sample)

    # corr indices path (return_corr_indices like the reference's val usage)
    ds_corr = ThreeDMatchPairDataset(
        threedmatch_root, "train", point_limit=256, use_augmentation=False,
        return_corr_indices=True, matching_radius=0.05, seed=0,
    )
    sample = ds_corr[1]
    corr = sample["corr_indices"]
    assert corr.ndim == 2 and corr.shape[1] == 2 and corr.shape[0] > 0
    d = np.linalg.norm(
        sample["ref_points"][corr[:, 0]]
        - _apply(sample["src_points"][corr[:, 1]], sample["transform"]),
        axis=1,
    )
    assert float(d.max()) < 0.05


def test_threedmatch_rotated_variant(threedmatch_root):
    from ref_geotransformer_tpu.data.datasets.threedmatch import ThreeDMatchPairDataset

    ds = ThreeDMatchPairDataset(threedmatch_root, "train", rotated=True, seed=3)
    _check_pair_schema(ds[0])


# ---------------------------------------------------------------------------
# KITTI odometry: npy scans + metadata pkl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    (root / "metadata").mkdir()
    (root / "downsampled" / "00").mkdir(parents=True)

    rng = np.random.default_rng(1)
    metadata = []
    for frame0, frame1 in [(0, 10), (20, 30)]:
        transform = _random_transform(rng).astype(np.float64)
        transform[:3, 3] *= 10.0  # KITTI-scale translations
        ref = (rng.uniform(-20, 20, (400, 3))).astype(np.float32)
        src = _apply(ref, np.linalg.inv(transform)).astype(np.float32)
        pcd0 = f"downsampled/00/{frame0:06d}.npy"
        pcd1 = f"downsampled/00/{frame1:06d}.npy"
        np.save(str(root / pcd0), ref)
        np.save(str(root / pcd1), src)
        metadata.append(
            {"seq_id": 0, "frame0": frame0, "frame1": frame1, "pcd0": pcd0, "pcd1": pcd1,
             "transform": transform}
        )
    with open(root / "metadata" / "train.pkl", "wb") as f:
        pickle.dump(metadata, f)
    return str(root)


def test_kitti_getitem(kitti_root):
    from ref_geotransformer_tpu.data.datasets.kitti import OdometryKittiPairDataset

    ds = OdometryKittiPairDataset(kitti_root, "train", point_limit=350, use_augmentation=True, seed=0)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["ref_points"].shape[0] <= 350
    # augmentation includes scale + shift; alignment still must hold
    _check_pair_schema(sample, atol=0.05)
    sample_plain = OdometryKittiPairDataset(kitti_root, "train", seed=0)[1]
    _check_pair_schema(sample_plain, atol=1e-3)


# ---------------------------------------------------------------------------
# ModelNet: pkl of {points, normals, label}
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("modelnet")
    rng = np.random.default_rng(2)
    data_list = []
    for label in (0, 2, 4):  # asymmetric categories
        pts = rng.uniform(-1, 1, (2048, 3)).astype(np.float32)
        pts[:, 2] = 0.3 * np.sin(3 * pts[:, 0]) + 0.2 * pts[:, 1]
        normals = rng.normal(size=(2048, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        data_list.append({"points": pts, "normals": normals, "label": label})
    for subset in ("train", "val", "test"):
        with open(root / f"{subset}.pkl", "wb") as f:
            pickle.dump(data_list, f)
    return str(root)


def test_modelnet_getitem(modelnet_root):
    from ref_geotransformer_tpu.data.datasets.modelnet import ModelNetPairDataset

    ds = ModelNetPairDataset(
        modelnet_root, "train", num_points=512, rotation_magnitude=45.0,
        translation_magnitude=0.5, keep_ratio=0.7, crop_method="plane",
        noise_magnitude=None, seed=0,
    )
    assert len(ds) == 3
    sample = ds[0]
    _check_pair_schema(sample, atol=0.05)
    # crop keeps ~keep_ratio of the sampled points
    assert sample["src_points"].shape[0] < 512
    assert sample["raw_points"].shape[0] == 512 if "raw_points" in sample else True


def test_modelnet_deterministic(modelnet_root):
    from ref_geotransformer_tpu.data.datasets.modelnet import ModelNetPairDataset

    ds = ModelNetPairDataset(
        modelnet_root, "test", num_points=256, rotation_magnitude=45.0,
        translation_magnitude=0.5, deterministic=True, seed=0,
    )
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["ref_points"], b["ref_points"])
    np.testing.assert_array_equal(a["transform"], b["transform"])


# ---------------------------------------------------------------------------
# LineMod/BOP: mesh PLY + depth/mask PNGs + scene json tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def linemod_root(tmp_path_factory):
    PIL_Image = pytest.importorskip("PIL.Image")
    root = tmp_path_factory.mktemp("bop")
    base = root / "linemod"
    (base / "models").mkdir(parents=True)
    frame_dir = base / "train" / "000001"
    (frame_dir / "depth").mkdir(parents=True)
    (frame_dir / "mask_visib").mkdir(parents=True)

    # ascii PLY mesh: a unit-ish box (12 triangles), mm units like BOP
    verts_mm = np.array(
        [[x, y, z] for x in (0, 60) for y in (0, 80) for z in (0, 100)], np.float64
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int64,
    )
    with open(base / "models" / "obj_000001.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts_mm)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in verts_mm:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")

    # synthetic 16-bit depth + full-visibility mask
    h, w = 120, 160
    depth = np.zeros((h, w), np.uint16)
    mask = np.zeros((h, w), np.uint8)
    depth[30:90, 40:120] = 800  # 0.8 m plane
    mask[30:90, 40:120] = 255
    PIL_Image.fromarray(depth).save(frame_dir / "depth" / "000000.png")
    PIL_Image.fromarray(mask).save(frame_dir / "mask_visib" / "000000_000000.png")

    cam_k = [500.0, 0.0, 80.0, 0.0, 500.0, 60.0, 0.0, 0.0, 1.0]
    with open(frame_dir / "scene_camera.json", "w") as f:
        json.dump({"0": {"cam_K": cam_k, "depth_scale": 1.0}}, f)
    rot = np.eye(3)
    with open(frame_dir / "scene_gt.json", "w") as f:
        json.dump(
            {"0": [{"cam_R_m2c": rot.flatten().tolist(), "cam_t_m2c": [0.0, 0.0, 800.0],
                    "obj_id": 1}]},
            f,
        )
    return str(root)


def test_linemod_build_and_getitem(linemod_root):
    from ref_geotransformer_tpu.data.datasets.linemod import LMODataset

    ds = LMODataset(
        linemod_root, reload_data=True, data_augmentation=True, points_limit=200,
        mode="train", seed=0,
    )
    assert len(ds) == 1
    sample = ds[0]
    assert sample["ref_points"].shape[0] <= 200
    assert sample["src_points"].shape[0] <= 200
    for key in ("ref_points", "src_points", "transform", "obj_id", "frame_id"):
        assert key in sample
    # depth plane at 0.8 m back-projects to z == 0.8
    ds_plain = LMODataset(
        linemod_root, reload_data=False, data_augmentation=False, points_limit=200,
        mode="train", seed=0,
    )
    ref = ds_plain[0]["ref_points"]
    np.testing.assert_allclose(ref[:, 2], 0.8, atol=1e-6)
    # cache round-trips
    assert osp.exists(osp.join(linemod_root, "linemod", "cache", "lm_train_200.pkl"))


# ---------------------------------------------------------------------------
# fixture -> PairLoader -> padded static batch (the full ingestion path)
# ---------------------------------------------------------------------------


def test_threedmatch_to_padded_pair(threedmatch_root):
    from ref_geotransformer_tpu.data.datasets.threedmatch import ThreeDMatchPairDataset
    from ref_geotransformer_tpu.data.loader import pack_pair

    ds = ThreeDMatchPairDataset(threedmatch_root, "train", point_limit=256, seed=0)
    pair = pack_pair(ds[0], 512)
    assert pair["ref_points"].shape == (512, 3)
    assert pair["ref_masks"].sum() == min(256, 300)
    assert pair["transform"].shape == (4, 4)


def test_modelnet_optim_env_overrides(monkeypatch):
    """REF_GT_LR / REF_GT_WARMUP shorten the reference's 100k-iter horizon
    (10k warmup, modelnet config.py) for fixture/probe runs — without them a
    CI-scale run never leaves warmup (lr stays ~eta_init * lr)."""
    import importlib.util
    import os

    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "experiments", "geotransformer_modelnet_rpmnet_stage4", "config.py")

    def load_cfg():
        spec = importlib.util.spec_from_file_location("_mn_cfg_test", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.make_cfg()

    cfg = load_cfg()
    assert cfg.optim.warmup_steps == 10000 and cfg.optim.lr == pytest.approx(1e-4)
    monkeypatch.setenv("REF_GT_WARMUP", "300")
    monkeypatch.setenv("REF_GT_LR", "3e-4")
    cfg = load_cfg()
    assert cfg.optim.warmup_steps == 300 and cfg.optim.lr == pytest.approx(3e-4)
