import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import grid_from_ijk, grid_from_dense
from infinicube_tpu.ops.raycast import dda_first_hit, raycast_grid


def test_axis_aligned_hits():
    occ = jnp.zeros((8, 8, 8), bool).at[4, 4, 4].set(True)
    # ray along +x from outside, vs=1, origin=0, ijk_min=0
    ro = jnp.array([[-3.0, 4.0, 4.0]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    hit = dda_first_hit(occ, ro, rd, 1.0, 0.0, (0, 0, 0))
    assert bool(hit.hit[0])
    np.testing.assert_array_equal(np.asarray(hit.ijk[0]), [4, 4, 4])
    # voxel 4 spans world x in [3.5, 4.5): entry at t = 3.5 - (-3) = 6.5
    assert np.isclose(float(hit.t_entry[0]), 6.5, atol=1e-4)
    assert np.isclose(float(hit.t_exit[0]), 7.5, atol=1e-4)


def test_miss_and_negative_direction():
    occ = jnp.zeros((8, 8, 8), bool).at[2, 3, 5].set(True)
    ro = jnp.array([[10.0, 3.0, 5.0], [10.0, 0.0, 0.0]])
    rd = jnp.array([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    hit = dda_first_hit(occ, ro, rd, 1.0, 0.0, (0, 0, 0))
    assert bool(hit.hit[0]) and not bool(hit.hit[1])
    assert np.isclose(float(hit.t_entry[0]), 10.0 - 2.5, atol=1e-4)


def test_first_hit_ordering_diagonal():
    # two occupied voxels on a diagonal ray: nearest must win
    occ = jnp.zeros((16, 16, 16), bool).at[5, 5, 5].set(True).at[9, 9, 9].set(True)
    d = jnp.array([1.0, 1.0, 1.0])
    d = d / jnp.linalg.norm(d)
    hit = dda_first_hit(occ, jnp.array([[0.0, 0.0, 0.0]]), d[None], 1.0, 0.0,
                        (0, 0, 0))
    assert bool(hit.hit[0])
    np.testing.assert_array_equal(np.asarray(hit.ijk[0]), [5, 5, 5])


def test_anisotropic_voxels_and_offset_grid():
    vs = jnp.array([0.5, 1.0, 2.0])
    org = jnp.array([10.0, -5.0, 3.0])
    occ = jnp.zeros((6, 6, 6), bool).at[3, 2, 1].set(True)
    ijk_min = (-2, -2, -2)
    # voxel world center: org + ijk*vs with local (3,2,1) -> ijk (1,0,-1)
    center = np.asarray(org) + np.array([1, 0, -1]) * np.asarray(vs)
    ro = jnp.asarray(center + np.array([0.0, 0.0, 10.0]), jnp.float32)[None]
    rd = jnp.array([[0.0, 0.0, -1.0]])
    hit = dda_first_hit(occ, ro, rd, vs, org, ijk_min)
    assert bool(hit.hit[0])
    np.testing.assert_array_equal(np.asarray(hit.ijk[0]), [1, 0, -1])
    # entry at top face: center_z + vs_z/2 -> t = 10 - 1 = 9
    assert np.isclose(float(hit.t_entry[0]), 9.0, atol=1e-3)


def test_ray_starting_inside_volume():
    occ = jnp.ones((4, 4, 4), bool)
    ro = jnp.array([[1.2, 1.2, 1.2]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    hit = dda_first_hit(occ, ro, rd, 1.0, 0.0, (0, 0, 0))
    assert bool(hit.hit[0])
    assert float(hit.t_entry[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(hit.ijk[0]), [1, 1, 1])


def test_raycast_grid_attributes():
    ijk = jnp.array([[[2, 2, 2], [5, 2, 2]]], jnp.int32)
    g = grid_from_ijk(ijk, jnp.ones((1, 2), bool), 1.0, 0.0, capacity=8)
    sem = jnp.zeros((g.capacity, 1), jnp.float32)
    n = int(g.num_voxels[0])
    # semantic value = i-coordinate of voxel
    sem = sem.at[:n, 0].set(g.ijk[0, :n, 0].astype(jnp.float32))
    ro = jnp.array([[-5.0, 2.0, 2.0], [10.0, 2.0, 2.0]])
    rd = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    hit, attrs = raycast_grid(g, 0, ro, rd, (0, 0, 0), (8, 8, 8),
                              {"sem": sem})
    assert bool(hit.hit.all())
    np.testing.assert_array_equal(np.asarray(hit.ijk[:, 0]), [2, 5])
    np.testing.assert_allclose(np.asarray(attrs["sem"][:, 0]), [2.0, 5.0])


def test_dense_grid_depth_matches_analytic():
    # solid floor at k=0; rays from above at an angle
    occ = jnp.zeros((16, 16, 4), bool).at[:, :, 0].set(True)
    rng = np.random.default_rng(0)
    n = 32
    ro = jnp.asarray(np.stack([rng.uniform(2, 14, n), rng.uniform(2, 14, n),
                               np.full(n, 3.0)], -1), jnp.float32)
    d = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
                  -np.ones(n)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    hit = dda_first_hit(occ, ro, jnp.asarray(d, jnp.float32), 1.0, 0.0, (0, 0, 0))
    assert bool(hit.hit.all())
    # floor top face at z = 0.5; t_entry = (3.0 - 0.5)/|dz|
    ref = (3.0 - 0.5) / np.abs(d[:, 2])
    np.testing.assert_allclose(np.asarray(hit.t_entry), ref, atol=1e-3)
