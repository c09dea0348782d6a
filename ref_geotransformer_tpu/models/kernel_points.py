"""Deterministic KPConv kernel-point dispositions.

The reference generates kernel points by spherical Lloyd relaxation or
repulsive-potential descent, caches them to a .ply, and then applies a random
rotation + gaussian noise at EVERY load (kpconv/kernel_points.py:389-455) —
a nondeterministic buffer that pretrained checkpoints override anyway. Here
kernel points are generated once with a fixed seed via repulsive-potential
descent (same physics: points repel each other inside a sphere, one point
pinned at the center), cached to an .npy next to this file, and treated as a
deterministic constant. Checkpoint-parity runs load the kernel points carried
by the converted checkpoint instead.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "dispositions")


def _generate_kernel_points(
    num_points: int,
    dimension: int = 3,
    num_iterations: int = 10000,
    step: float = 1e-2,
    seed: int = 1337,
) -> np.ndarray:
    """Repulsive-potential descent inside the unit ball, first point fixed at
    the origin. Returns (num_points, dimension) in a ball of radius ~0.7 that
    is then rescaled so the average point radius is 1 (reference convention:
    kernel 'radius' scales dispositions whose mean radius is normalized)."""
    rng = np.random.default_rng(seed)
    points = rng.uniform(-1.0, 1.0, size=(num_points, dimension))
    radii = np.linalg.norm(points, axis=1, keepdims=True)
    points = points / np.maximum(radii, 1e-9) * rng.uniform(0.1, 1.0, size=(num_points, 1))
    points[0] = 0.0

    for it in range(num_iterations):
        diff = points[:, None, :] - points[None, :, :]  # (K, K, D)
        sq = np.sum(diff**2, axis=-1) + 1e-12
        np.fill_diagonal(sq, 1.0)
        # inverse-square repulsion
        force = np.sum(diff / sq[..., None] ** 1.5, axis=1)
        # weak attraction to the center keeps the cloud bounded
        force -= 2.0 * points
        points += step * force / max(1.0, np.max(np.linalg.norm(force, axis=1)))
        points[0] = 0.0
        # project back into the unit ball
        radii = np.linalg.norm(points, axis=1, keepdims=True)
        points = np.where(radii > 1.0, points / radii, points)

    # normalize: mean radius of non-center points == 0.66, the reference's
    # ratio of kernel-point extent to convolution radius
    # (kernel_points.py:247-248,380-385)
    radii = np.linalg.norm(points[1:], axis=1)
    points = points * (0.66 / radii.mean())
    points[0] = 0.0
    return points.astype(np.float32)


@lru_cache(maxsize=None)
def load_kernels(radius: float, num_kernel_points: int, dimension: int = 3) -> np.ndarray:
    """Kernel points scaled to `radius`. Cached on disk for determinism."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR, f"k_{num_kernel_points:03d}_{dimension}D.npy")
    if os.path.exists(path):
        base = np.load(path)
    else:
        base = _generate_kernel_points(num_kernel_points, dimension)
        np.save(path, base)
    return (base * radius).astype(np.float32)
