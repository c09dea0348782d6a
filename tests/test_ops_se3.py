import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from ref_geotransformer_tpu.ops import (
    apply_transform,
    apply_rotation,
    compose_transforms,
    get_transform_from_rotation_translation,
    get_rotation_translation_from_transform,
    inverse_transform,
    rodrigues_rotation_matrix,
    rodrigues_alignment_matrix,
    skew_symmetric_matrix,
    vector_angle,
)

rng = np.random.default_rng(0)


def random_transform(n=None):
    shape = () if n is None else (n,)
    rot = Rotation.random(n, random_state=42).as_matrix().astype(np.float32)
    trans = rng.normal(size=shape + (3,)).astype(np.float32)
    t = np.zeros(shape + (4, 4), np.float32)
    t[..., :3, :3] = rot
    t[..., :3, 3] = trans
    t[..., 3, 3] = 1
    return t


def test_apply_transform_single():
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    t = random_transform()
    out = np.asarray(apply_transform(jnp.array(pts), jnp.array(t)))
    expected = pts @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_apply_transform_batched():
    pts = rng.normal(size=(4, 20, 3)).astype(np.float32)
    t = random_transform(4)
    out = np.asarray(apply_transform(jnp.array(pts), jnp.array(t)))
    for b in range(4):
        expected = pts[b] @ t[b, :3, :3].T + t[b, :3, 3]
        np.testing.assert_allclose(out[b], expected, atol=1e-5)


def test_inverse_and_compose():
    t = random_transform()
    inv = np.asarray(inverse_transform(jnp.array(t)))
    np.testing.assert_allclose(inv @ t, np.eye(4), atol=1e-5)
    composed = np.asarray(compose_transforms(jnp.array(t), jnp.array(inv)))
    np.testing.assert_allclose(composed, np.eye(4), atol=1e-5)


def test_rotation_translation_roundtrip():
    t = random_transform(3)
    r, tr = get_rotation_translation_from_transform(jnp.array(t))
    t2 = np.asarray(get_transform_from_rotation_translation(r, tr))
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_skew_symmetric():
    v = rng.normal(size=(5, 3)).astype(np.float32)
    s = np.asarray(skew_symmetric_matrix(jnp.array(v)))
    w = rng.normal(size=(5, 3)).astype(np.float32)
    cross = np.cross(v, w)
    np.testing.assert_allclose(np.einsum("bij,bj->bi", s, w), cross, atol=1e-5)


def test_rodrigues_vs_scipy():
    axis = rng.normal(size=(8, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, np.pi, size=(8,)).astype(np.float32)
    got = np.asarray(rodrigues_rotation_matrix(jnp.array(axis), jnp.array(angle)))
    expected = Rotation.from_rotvec(axis * angle[:, None]).as_matrix()
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rodrigues_alignment():
    src = rng.normal(size=(16, 3)).astype(np.float32)
    tgt = rng.normal(size=(16, 3)).astype(np.float32)
    rot = np.asarray(rodrigues_alignment_matrix(jnp.array(src), jnp.array(tgt)))
    aligned = np.einsum("bij,bj->bi", rot, src / np.linalg.norm(src, axis=-1, keepdims=True))
    tgt_unit = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    np.testing.assert_allclose(aligned, tgt_unit, atol=1e-4)


def test_rodrigues_alignment_degenerate():
    src = np.array([[1.0, 0, 0], [0, 0, 1.0]], np.float32)
    # parallel
    rot = np.asarray(rodrigues_alignment_matrix(jnp.array(src), jnp.array(src)))
    np.testing.assert_allclose(rot, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)
    # anti-parallel
    rot = np.asarray(rodrigues_alignment_matrix(jnp.array(src), jnp.array(-src)))
    aligned = np.einsum("bij,bj->bi", rot, src)
    np.testing.assert_allclose(aligned, -src, atol=1e-4)


def test_vector_angle():
    x = np.array([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]], np.float32)
    y = np.array([[0, 1.0, 0], [-1.0, 0, 0], [1.0, 0, 0]], np.float32)
    ang = np.asarray(vector_angle(jnp.array(x), jnp.array(y), degrees=True))
    np.testing.assert_allclose(ang, [90.0, 180.0, 0.0], atol=1e-4)
