"""Build ModelNet train/val/test pickles from the modelnet40_ply_hdf5_2048
distribution (ref parity: data/ModelNet/split_data.py — same 0.8/0.2
train/val split of the train shards, same per-item dict schema
{points, normals, label} consumed by data/datasets/modelnet.py).

Usage: python tools/modelnet_split_data.py --root <dir with modelnet40_ply_hdf5_2048> [--seed 0]
"""

from __future__ import annotations

import argparse
import os.path as osp
import pickle

import numpy as np


def load_subset(root: str, subset: str):
    import h5py

    with open(osp.join(root, f"{subset}_files.txt")) as f:
        lines = [line.strip() for line in f if line.strip()]
    all_points, all_normals, all_labels = [], [], []
    for filename in lines:
        # the shipped *_files.txt prefixes paths with the dataset dir name
        path = osp.join(root, osp.basename(filename))
        with h5py.File(path, "r") as h5file:
            all_points.append(h5file["data"][:])
            all_normals.append(h5file["normal"][:])
            all_labels.append(h5file["label"][:].flatten().astype(np.int64))
    points = np.concatenate(all_points, axis=0)
    normals = np.concatenate(all_normals, axis=0)
    labels = np.concatenate(all_labels, axis=0)
    return [
        dict(points=points[i], normals=normals[i], label=labels[i]) for i in range(points.shape[0])
    ]


def dump_pickle(data, filename: str) -> None:
    with open(filename, "wb") as f:
        pickle.dump(data, f)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True, help="dir containing modelnet40_ply_hdf5_2048")
    parser.add_argument("--output_dir", default=None, help="where to write the pkls (default: --root)")
    parser.add_argument("--seed", type=int, default=None, help="train/val split seed (reference uses the global numpy state)")
    args = parser.parse_args()

    root = osp.join(args.root, "modelnet40_ply_hdf5_2048")
    if not osp.isdir(root):
        root = args.root
    out = args.output_dir or root
    rng = np.random.default_rng(args.seed)

    train_all = load_subset(root, "train")
    print(f"train data loaded: {len(train_all)} models")
    indices = rng.permutation(len(train_all))
    num_train = int(len(train_all) * 0.8)
    dump_pickle([train_all[i] for i in indices[:num_train].tolist()], osp.join(out, "train.pkl"))
    dump_pickle([train_all[i] for i in indices[num_train:].tolist()], osp.join(out, "val.pkl"))

    test_all = load_subset(root, "test")
    print(f"test data loaded: {len(test_all)} models")
    dump_pickle(test_all, osp.join(out, "test.pkl"))
    print(f"wrote train.pkl/val.pkl/test.pkl to {out}")


if __name__ == "__main__":
    main()
