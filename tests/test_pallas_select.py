"""group_min_prefilter / prefiltered_min_k vs numpy oracles (interpret mode).

The prefilter stage replaces the full-width approx_min_k PartialReduce of
the pyramid radius searches (neighbors.py) with a Pallas fused
distance + strided group-min; these tests pin the exact strided-min
semantics and the end-to-end neighbor contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ref_geotransformer_tpu.ops.pallas_select import group_min_prefilter, prefiltered_min_k


def _brute_sq(q, s, mask):
    d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    d2[:, ~mask] = 1e12
    return d2


@pytest.mark.parametrize("m,n,g", [(300, 1000, 4), (128, 700, 2), (97, 513, 3)])
def test_group_min_matches_strided_oracle(m, n, g):
    rng = np.random.default_rng(7)
    q = rng.normal(size=(m, 3)).astype(np.float32)
    s = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[rng.permutation(n)[: n // 10]] = False

    vals, idx = group_min_prefilter(jnp.array(q), jnp.array(s), jnp.array(mask), g, interpret=True)
    vals, idx = np.array(vals), np.array(idx)
    s_width = vals.shape[1]

    d2 = _brute_sq(q, s, mask)
    padded = np.concatenate([d2, np.full((m, g * s_width - n), 1e12, np.float32)], 1)
    padded = padded.reshape(m, g, s_width)
    np.testing.assert_allclose(vals, padded.min(1), rtol=1e-5, atol=1e-5)
    ref_idx = np.minimum(padded.argmin(1) * s_width + np.arange(s_width)[None, :], n - 1)
    live = vals < 1e11
    assert (idx[live] == ref_idx[live]).all()


def test_prefiltered_min_k_neighbor_contract():
    rng = np.random.default_rng(3)
    m, n, k = 256, 2000, 20
    q = rng.normal(size=(m, 3)).astype(np.float32)
    s = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[-31:] = False

    d, idx = prefiltered_min_k(jnp.array(q), jnp.array(s), jnp.array(mask), k,
                               num_groups=4, interpret=True)
    d, idx = np.array(d), np.array(idx)
    # ascending distances, valid indices, and the distances actually belong
    # to the returned indices
    assert (np.diff(d, axis=1) >= -1e-5).all()
    live = d < 1e11
    assert idx[live].min() >= 0 and idx[live].max() < n
    gd = ((q[:, None, :] - s[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(gd[live], d[live], rtol=1e-4, atol=1e-5)

    # high recall vs exact top-k even on spatially-unsorted data
    exact = np.argsort(_brute_sq(q, s, mask), 1)[:, :k]
    recall = np.mean([len(set(idx[i]) & set(exact[i])) / k for i in range(m)])
    assert recall > 0.95


def test_radius_search_prefilter_matches_brute():
    from ref_geotransformer_tpu.ops.neighbors import radius_search

    rng = np.random.default_rng(11)
    m, n, k = 200, 1500, 24
    q = rng.normal(size=(m, 3)).astype(np.float32)
    s = rng.normal(size=(n, 3)).astype(np.float32)
    qm = np.ones(m, bool); qm[-7:] = False
    sm = np.ones(n, bool); sm[-13:] = False
    radius = 0.45

    got = np.array(radius_search(jnp.array(q), jnp.array(s), jnp.array(qm), jnp.array(sm),
                                 radius, k, method="prefilter"))
    ref = np.array(radius_search(jnp.array(q), jnp.array(s), jnp.array(qm), jnp.array(sm),
                                 radius, k, method="brute"))
    assert got.shape == ref.shape
    # sentinel semantics: invalid queries all-sentinel
    assert (got[~qm] == n).all()
    # the prefilter is approximate (like the shipped approx_min_k path):
    # compare neighbor SETS, not slots — a single missed neighbor shifts
    # every later slot in the sorted row. At real scale (S=2560, spatially
    # sorted clouds) the collision rate is far lower; the chip-measured
    # recall lives in tools/bench_pyramid_kernel.py. This tiny S=256 case
    # still must find >93% of true in-radius neighbors.
    hits = total = 0
    for i in range(m):
        ref_set = set(ref[i][ref[i] < n].tolist())
        got_set = set(got[i][got[i] < n].tolist())
        hits += len(ref_set & got_set)
        total += len(ref_set)
    assert total > 0
    assert hits / total > 0.93, f"prefilter neighbor recall {hits/total:.3f}"
