"""Similarity layer: scalar parity semantics + batch/matrix properties."""

import numpy as np
import jax.numpy as jnp

from bliss_tpu.sim import (
    cosine_similarity,
    cosine_similarity_matrix,
    distance,
    distance_matrix,
    kmeans,
    nearest_neighbors,
    nearest_neighbors_all,
    playlist_order,
)


def _feats(n=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 4).astype(np.float64) * 5


def test_distance_scalar_semantics():
    v1 = np.array([1.0, 2.0, 3.0, 4.0])
    v2 = np.array([2.0, 4.0, 6.0, 8.0])
    want = np.sqrt(((v1 - v2) ** 2).sum())
    assert float(distance(v1, v2)) == np.float32(want)


def test_cosine_scalar_semantics():
    v1 = np.array([1.0, 2.0, 3.0, 4.0])
    v2 = np.array([2.0, 4.0, 6.0, 8.0])
    np.testing.assert_allclose(float(cosine_similarity(v1, v2)), 1.0, atol=1e-12)
    np.testing.assert_allclose(float(cosine_similarity(v1, -v1)), -1.0, atol=1e-12)
    v4 = np.array([1.0, 0.0, 0.0, 0.0])
    v5 = np.array([0.0, 1.0, 0.0, 0.0])
    np.testing.assert_allclose(float(cosine_similarity(v4, v5)), 0.0, atol=1e-12)


def test_distance_properties():
    f = _feats()
    D = np.asarray(distance_matrix(jnp.asarray(f)))
    # symmetry and zero diagonal (reference README documents d(x,x)=0)
    np.testing.assert_allclose(D, D.T, atol=1e-9)
    np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-9)
    # matches pairwise scalar computation
    for i, j_ in [(0, 1), (5, 33), (63, 2)]:
        want = np.sqrt(((f[i] - f[j_]) ** 2).sum())
        np.testing.assert_allclose(D[i, j_], want, rtol=1e-10)


def test_cosine_matrix_bounds_and_diag():
    f = _feats(32, 1)
    S = np.asarray(cosine_similarity_matrix(jnp.asarray(f)))
    assert (S <= 1 + 1e-9).all() and (S >= -1 - 1e-9).all()
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-9)


def test_nearest_neighbors_and_playlist():
    f = _feats(100, 2)
    q = f[7]
    d, idx = nearest_neighbors(jnp.asarray(f), jnp.asarray(q), k=5)
    d, idx = np.asarray(d), np.asarray(idx)
    assert idx[0] == 7 and d[0] == 0.0
    brute = np.sqrt(((f - q) ** 2).sum(1))
    np.testing.assert_allclose(d, np.sort(brute)[:5], rtol=1e-6)

    order = np.asarray(playlist_order(jnp.asarray(f), 7))
    assert order[0] == 7
    np.testing.assert_array_equal(order, np.argsort(brute))


def test_nearest_neighbors_all_vs_bruteforce():
    f = _feats(n=37, seed=3).astype(np.float32)
    # block < n exercises the blocked path and last-block padding
    d, idx = (np.asarray(x) for x in nearest_neighbors_all(f, k=4, block=16))
    assert d.shape == (37, 4) and idx.shape == (37, 4)
    full = np.sqrt(
        ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    )
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :4]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)
    assert (idx == ref_idx).all()
    assert (idx != np.arange(37)[:, None]).all()  # never self
    # degenerate sizes
    d0, i0 = nearest_neighbors_all(f[:1], k=4)
    assert d0.shape == (1, 0) and i0.shape == (1, 0)
    # k clamped to n-1
    d2, _ = nearest_neighbors_all(f[:3], k=99)
    assert d2.shape == (3, 2)


def test_kmeans_clusters_separated_data():
    rng = np.random.RandomState(3)
    a = rng.randn(50, 4) + np.array([10, 0, 0, 0])
    b = rng.randn(50, 4) + np.array([-10, 0, 0, 0])
    f = jnp.asarray(np.concatenate([a, b]))
    cents, assign = kmeans(f, k=2, iters=10, seed=0)
    assign = np.asarray(assign)
    # each true cluster maps to one label
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_kmeanspp_deterministic_and_seed_robust():
    """k-means++ init: same seed -> identical output; across seeds the
    well-separated clustering must be recovered EVERY time (uniform init
    could collapse two seeds into one blob — the luck the ++ init removes)."""
    rng = np.random.RandomState(11)
    blobs = [rng.randn(40, 4) * 0.2 + mu for mu in
             (np.array([8, 0, 0, 0]), np.array([-8, 0, 0, 0]),
              np.array([0, 8, 0, 0]))]
    f = jnp.asarray(np.concatenate(blobs))
    c1, a1 = kmeans(f, k=3, seed=5)
    c2, a2 = kmeans(f, k=3, seed=5)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    for seed in range(8):
        _, assign = kmeans(f, k=3, seed=seed)
        assign = np.asarray(assign)
        labels = [set(assign[i * 40 : (i + 1) * 40]) for i in range(3)]
        assert all(len(s) == 1 for s in labels)
        assert len(set().union(*labels)) == 3


def test_kmeans_convergence_stop_matches_long_run():
    rng = np.random.RandomState(4)
    f = jnp.asarray(rng.randn(300, 4))
    c_tol, _ = kmeans(f, k=5, iters=500, seed=1, tol=1e-6)
    c_more, _ = kmeans(f, k=5, iters=501, seed=1, tol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c_tol), np.asarray(c_more), atol=1e-5
    )


def test_nearest_neighbors_all_degenerate_k():
    """k <= 0 (e.g. a clamped single-entry library) returns empty columns
    instead of raising inside jax.lax.top_k."""
    from bliss_tpu.sim import nearest_neighbors_all

    feats = np.arange(8, dtype=np.float32).reshape(2, 4)
    for k in (0, -1):
        d, i = nearest_neighbors_all(feats, k)
        assert d.shape == (2, 0) and i.shape == (2, 0)
