"""Grid constructors — TPU-native equivalents of fvdb's gridbatch_from_*.

All constructors are jit-compatible: output capacity is a static argument and
overflow drops the highest-key voxels (callers size capacity generously; an
``overflowed`` flag can be recovered by comparing num_voxels to capacity).

Reference API being mirrored (SURVEY.md §2.5): gridbatch_from_points,
gridbatch_from_ijk, gridbatch_from_dense, gridbatch_from_nearest_voxels_to_points,
gridbatch_from_mesh, coarsened_grid, subdivided_grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import keys as K
from infinicube_tpu.grid.grid import Grid, make_grid


def _unique_sorted_keys(qkeys: jnp.ndarray, capacity: int):
    """Per-row sort + dedup into a fixed-capacity row.

    qkeys uint32[B, N] (invalid = INVALID_KEY) -> (uint32[B, capacity] sorted
    ascending with INVALID_KEY padding, int32[B] dropped count). Overflow
    drops highest keys and is reported, never silent.
    """
    def row(rk):
        rk = jnp.sort(rk)
        first = jnp.concatenate([jnp.array([True]),
                                 rk[1:] != rk[:-1]]) & (rk != K.INVALID_KEY)
        pos = jnp.cumsum(first) - 1
        dst = jnp.where(first, pos, capacity)  # dropped by scatter mode="drop"
        out = jnp.full((capacity,), K.INVALID_KEY, dtype=jnp.uint32)
        n_unique = jnp.sum(first).astype(jnp.int32)
        return out.at[dst].set(rk, mode="drop"), \
            jnp.maximum(n_unique - capacity, 0)
    return jax.vmap(row)(qkeys)


def grid_from_keys(qkeys: jnp.ndarray, capacity: int, voxel_size, origin) -> Grid:
    """uint32[B, N] possibly-duplicated keys -> deduped sorted Grid.

    Capacity overflow drops the highest keys; the per-row drop count is
    surfaced as ``Grid.num_dropped`` / ``Grid.overflowed``."""
    ukeys, dropped = _unique_sorted_keys(qkeys, capacity)
    mask = ukeys != K.INVALID_KEY
    ijk = jnp.where(mask[..., None], K.unpack(ukeys), 0)
    voxel_size = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (3,))
    return Grid(ijk=ijk.astype(jnp.int32), mask=mask, keys=ukeys,
                voxel_size=voxel_size, origin=origin, num_dropped=dropped)


@partial(jax.jit, static_argnames=("capacity",))
def grid_from_points(points: jnp.ndarray, point_mask: jnp.ndarray,
                     voxel_size, origin, capacity: int) -> Grid:
    """fvdb gridbatch_from_points: one voxel per occupied cell.

    points f32[B, N, 3]; point_mask bool[B, N]. ijk = round((p - origin)/vs).
    """
    voxel_size = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (3,))
    ijk = jnp.round((points - origin) / voxel_size).astype(jnp.int32)
    return grid_from_keys(K.pack(ijk, point_mask), capacity, voxel_size, origin)


@partial(jax.jit, static_argnames=("capacity",))
def grid_from_ijk(ijk: jnp.ndarray, mask: jnp.ndarray,
                  voxel_size, origin, capacity: int) -> Grid:
    """fvdb gridbatch_from_ijk. ijk int32[B, N, 3], mask bool[B, N]."""
    return grid_from_keys(K.pack(ijk, mask), capacity, voxel_size, origin)


@partial(jax.jit, static_argnames=("capacity",))
def grid_from_nearest_voxels_to_points(points: jnp.ndarray, point_mask: jnp.ndarray,
                                       voxel_size, origin, capacity: int) -> Grid:
    """fvdb gridbatch_from_nearest_voxels_to_points: activate the 8 voxels
    nearest to each point (the trilinear-splat stencil)."""
    voxel_size = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (3,))
    gc = (points - origin) / voxel_size                      # [B, N, 3]
    base = jnp.floor(gc).astype(jnp.int32)
    corners = jnp.asarray(np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                               indexing="ij"), -1).reshape(8, 3),
                          dtype=jnp.int32)
    ijk8 = base[:, :, None, :] + corners[None, None]         # [B, N, 8, 3]
    mask8 = jnp.broadcast_to(point_mask[:, :, None], ijk8.shape[:3])
    B = points.shape[0]
    return grid_from_keys(K.pack(ijk8, mask8).reshape(B, -1),
                          capacity, voxel_size, origin)


def dense_ijk(dense_dims, ijk_min) -> jnp.ndarray:
    """int32[D*H*W, 3] row-major coordinates of a dense block."""
    D, H, W = dense_dims
    ii, jj, kk = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W),
                              indexing="ij")
    ijk = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(jnp.int32)
    return ijk + jnp.asarray(ijk_min, jnp.int32)


def grid_from_dense(batch_size: int, dense_dims, ijk_min, voxel_size, origin,
                    occupancy: jnp.ndarray | None = None,
                    capacity: int | None = None) -> Grid:
    """fvdb gridbatch_from_dense: fully (or occupancy-masked) active dense block.

    occupancy: optional bool[B, D, H, W]. Without it the grid is simply the
    sorted enumeration of the block (used for the diffusion dense latent grid,
    reference diffusion.py:1568-1600 create_dense_latents).
    """
    D, H, W = dense_dims
    n = D * H * W
    capacity = capacity or n
    ijk = jnp.broadcast_to(dense_ijk(dense_dims, ijk_min)[None], (batch_size, n, 3))
    if occupancy is None:
        mask = jnp.ones((batch_size, n), dtype=bool)
    else:
        mask = occupancy.reshape(batch_size, n)
    return grid_from_ijk(ijk, mask, voxel_size, origin, capacity=capacity)


@partial(jax.jit, static_argnames=("capacity", "factor"))
def coarsened_grid(grid: Grid, factor, capacity: int | None = None) -> Grid:
    """fvdb coarsened_grid: ijk // factor at voxel_size * factor.

    fvdb coarsening keeps the same origin convention: child voxel ijk maps to
    parent floor_div(ijk, factor); parent voxel_size = vs * factor; the parent
    origin shifts so that parent center covers its children:
    parent world center = origin + (ijk_c * factor + (factor-1)/2) * vs.
    """
    factor = np.broadcast_to(np.asarray(factor, np.int32), (3,))
    capacity = capacity or grid.capacity
    f = jnp.asarray(factor, jnp.int32)
    cijk = jnp.floor_divide(grid.ijk, f)
    vs = grid.voxel_size * f.astype(jnp.float32)
    org = grid.origin + grid.voxel_size * (f.astype(jnp.float32) - 1.0) / 2.0
    return grid_from_keys(K.pack(cijk, grid.mask), capacity, vs, org)


@partial(jax.jit, static_argnames=("capacity", "factor"))
def subdivided_grid(grid: Grid, factor, submask: jnp.ndarray | None = None,
                    capacity: int | None = None) -> Grid:
    """fvdb subdivided_grid / the structure-masked UpsamplingNearest support:
    each (optionally masked) voxel spawns prod(factor) children.

    submask: optional bool[B, C] restricting which parents subdivide (the
    structure-prediction decoder's occupancy mask, sunet.py:609-673).
    """
    factor = tuple(int(x) for x in np.broadcast_to(np.asarray(factor), (3,)))
    fx, fy, fz = factor
    nch = fx * fy * fz
    capacity = capacity or grid.capacity * nch
    offs = jnp.asarray(np.stack(np.meshgrid(np.arange(fx), np.arange(fy),
                                            np.arange(fz), indexing="ij"),
                                -1).reshape(nch, 3), jnp.int32)
    f = jnp.asarray(factor, jnp.int32)
    child = grid.ijk[:, :, None, :] * f + offs[None, None]   # [B, C, nch, 3]
    m = grid.mask if submask is None else (grid.mask & submask)
    cmask = jnp.broadcast_to(m[:, :, None], child.shape[:3])
    vs = grid.voxel_size / f.astype(jnp.float32)
    org = grid.origin - (grid.voxel_size - vs) / 2.0
    B = grid.batch_size
    return grid_from_keys(K.pack(child, cmask).reshape(B, -1), capacity, vs, org)


def merge_grids(a: Grid, b: Grid, capacity: int | None = None) -> Grid:
    """Union of two grids with identical voxel_size/origin (the device-side
    analogue of voxel_util.merge_grid2_to_grid1, reference voxel_util.py:191)."""
    capacity = capacity or (a.capacity + b.capacity)
    qkeys = jnp.concatenate([jnp.where(a.mask, a.keys, K.INVALID_KEY),
                             jnp.where(b.mask, b.keys, K.INVALID_KEY)], axis=1)
    return grid_from_keys(qkeys, capacity, a.voxel_size, a.origin)
