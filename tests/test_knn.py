import jax.numpy as jnp
import numpy as np

from infinicube_tpu.ops.knn import (
    color_from_points, knn_bruteforce, knn_grid_hash, semantic_from_points)
from infinicube_tpu.ops.knn_host import KDTree, knn_query


def ref_knn(q, r, k):
    d = np.sum((q[:, None] - r[None]) ** 2, -1)
    idx = np.argsort(d, 1)[:, :k]
    return np.take_along_axis(d, idx, 1), idx


def test_knn_bruteforce_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(500, 3)).astype(np.float32)
    d, i = knn_bruteforce(jnp.asarray(q), jnp.asarray(r), k=3)
    dn, iN = ref_knn(q, r, 3)
    np.testing.assert_allclose(np.asarray(d), dn, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), iN)


def test_knn_grid_hash_exact_within_cell():
    rng = np.random.default_rng(1)
    r = rng.uniform(0, 10, (800, 3)).astype(np.float32)
    q = (r[:50] + rng.normal(scale=0.05, size=(50, 3))).astype(np.float32)
    d, i = knn_grid_hash(jnp.asarray(q), jnp.asarray(r), cell_size=1.0, k=1)
    dn, iN = ref_knn(q, r, 1)
    np.testing.assert_array_equal(np.asarray(i), iN)
    np.testing.assert_allclose(np.asarray(d), dn, atol=1e-4)


def test_semantic_and_color_transfer():
    r = jnp.array([[0.0, 0, 0], [10.0, 0, 0]])
    sem = jnp.array([3, 7], jnp.int32)
    q = jnp.array([[0.1, 0, 0], [9.8, 0, 0]])
    out = semantic_from_points(q, r, sem)
    np.testing.assert_array_equal(np.asarray(out), [3, 7])
    cols = jnp.array([[1.0, 0, 0], [0, 0, 1.0]])
    c = color_from_points(q, r, cols, k=2)
    assert float(c[0, 0]) > 0.9 and float(c[1, 2]) > 0.9


def test_host_kdtree_matches_numpy():
    rng = np.random.default_rng(2)
    r = rng.normal(size=(2000, 3)).astype(np.float32)
    q = rng.normal(size=(128, 3)).astype(np.float32)
    d, i = KDTree(r).query(q, k=4)
    dn, iN = ref_knn(q, r, 4)
    np.testing.assert_allclose(np.sort(d, 1), np.sort(dn, 1), atol=1e-4)
    # indices agree (up to ties)
    agree = (np.sort(i, 1) == np.sort(iN, 1)).mean()
    assert agree > 0.99
    # small-ref brute-force path
    d2, i2 = knn_query(q, r[:10], k=2)
    dn2, iN2 = ref_knn(q, r[:10], 2)
    np.testing.assert_array_equal(i2, iN2)


def test_latent_semantic_from_grid():
    from infinicube_tpu.grid import grid_from_ijk, coarsened_grid
    from infinicube_tpu.ops.knn import latent_semantic_from_grid
    ijk = jnp.array([[[0, 0, 0], [1, 0, 0], [4, 4, 0], [5, 4, 0]]], jnp.int32)
    g = grid_from_ijk(ijk, jnp.ones((1, 4), bool), 1.0, 0.0, capacity=8)
    sem = jnp.zeros((8,), jnp.int32).at[:2].set(3).at[2:4].set(7)
    gc = coarsened_grid(g, (2, 2, 2), capacity=8)
    out = latent_semantic_from_grid(g, sem, gc)
    n = int(gc.num_voxels[0])
    got = set(np.asarray(out[:n]).tolist())
    assert got == {3, 7}
