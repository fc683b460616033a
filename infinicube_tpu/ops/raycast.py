"""Vectorized voxel DDA raycasting.

TPU-native replacement for fvdb's ray ops (``voxels_along_rays`` /
``segments_along_rays``; SURVEY.md §7.1-3). The voxel world is densified into a
crop-box occupancy block (bool[D, H, W]) and rays march it with an
Amanatides-Woo DDA, fully vectorized over rays inside a ``lax.fori_loop`` —
static shapes, no data-dependent control flow, so XLA maps it to gathers +
elementwise math.

Every consumer in the pipeline needs only the *first hit* per ray (guidance
buffers: depth/semantic/instance, reference utils/fvdb_utils.py:388-618; GSM
lifter: ``voxels_along_rays(max_voxels=1)``, gsm voxel_branch; occ-front split,
voxel_util.py:432-516), so the core op returns the first-hit cell plus
entry/exit distances (the ``segments_along_rays`` payload).

Cell convention matches the grid core: voxel ijk spans grid coords
[ijk - 0.5, ijk + 0.5), i.e. cell = floor((p - origin)/vs + 0.5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import occupancy_dense, to_dense


class RayHit(NamedTuple):
    hit: jnp.ndarray      # bool [N]
    t_entry: jnp.ndarray  # f32  [N] distance (units of |ray_d|) at cell entry
    t_exit: jnp.ndarray   # f32  [N]
    ijk: jnp.ndarray      # int32[N, 3] world voxel coordinate of the hit


def manhattan_distance_transform(occ: jnp.ndarray,
                                 max_dist: int = 255) -> jnp.ndarray:
    """Exact L1 distance-to-occupied transform, uint8[D, H, W].

    Separable two-pass chamfer per axis, each pass a log-depth
    ``associative_scan`` with the min-plus operator over (min, length) pairs
    — O(V log V) on device, computed once per scene and reused by every
    frame's raycast for empty-space skipping."""
    big = jnp.int32(1 << 14)
    d = jnp.where(occ, 0, big).astype(jnp.int32)

    def comb(a, b):
        ma, la = a
        mb, lb = b
        return jnp.minimum(mb, ma + lb), la + lb

    for axis in range(3):
        for rev in (False, True):
            arr = jnp.flip(d, axis) if rev else d
            ones = jnp.ones_like(arr)
            m, _ = jax.lax.associative_scan(comb, (arr, ones), axis=axis)
            d = jnp.flip(m, axis) if rev else m
    return jnp.minimum(d, max_dist).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("max_steps",))
def dda_first_hit(occ: jnp.ndarray, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                  voxel_size, origin, ijk_min, max_steps: int | None = None,
                  t_far: float = 1e9,
                  skip_dist: jnp.ndarray | None = None) -> RayHit:
    """March rays through a dense occupancy block; return first occupied cell.

    occ bool[D, H, W] — occupancy of the crop [ijk_min, ijk_min + dims).
    ray_o/ray_d f32[N, 3] world-space. t is measured in units of |ray_d|
    (pass normalized directions for Euclidean distance).

    skip_dist: optional uint8[D, H, W] Manhattan distance-to-occupied
    (``manhattan_distance_transform``). With it, rays in empty space jump
    ``(dist-1)`` L1 cells per iteration instead of stepping one boundary —
    the loop also exits as soon as every ray is resolved (lax.while_loop),
    cutting typical iteration counts by ~1-2 orders of magnitude.
    """
    D, H, W = occ.shape
    dims = jnp.array([D, H, W], jnp.float32)
    if max_steps is None:
        max_steps = D + H + W + 3
    vs = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    org = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (3,))
    imn = jnp.asarray(ijk_min, jnp.int32)

    # ray in cell units: cell c spans [c, c+1)
    o = (ray_o - org) / vs + 0.5 - imn.astype(jnp.float32)   # [N, 3]
    d = ray_d / vs
    eps = 1e-9
    d_safe = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    inv_d = 1.0 / d_safe

    # slab clip to [0, dims]
    tt0 = (0.0 - o) * inv_d
    tt1 = (dims - o) * inv_d
    t_lo = jnp.minimum(tt0, tt1)
    t_hi = jnp.maximum(tt0, tt1)
    t_enter = jnp.maximum(jnp.max(t_lo, axis=-1), 0.0)        # [N]
    t_leave = jnp.minimum(jnp.min(t_hi, axis=-1), t_far)
    alive0 = t_enter < t_leave

    start = o + d * (t_enter[:, None] + 1e-5)
    cell0 = jnp.clip(jnp.floor(start).astype(jnp.int32), 0,
                     jnp.array([D - 1, H - 1, W - 1]))
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    t_delta = jnp.abs(inv_d)
    l1_speed = jnp.sum(jnp.abs(d), axis=-1)                   # cells per unit t

    def t_max_of(cell):
        nb = cell.astype(jnp.float32) + (step > 0).astype(jnp.float32)
        return (nb - o) * inv_d

    def entry_exit_of(cell):
        lo_b = cell.astype(jnp.float32) + (step < 0).astype(jnp.float32)
        hi_b = cell.astype(jnp.float32) + (step > 0).astype(jnp.float32)
        te = jnp.max((lo_b - o) * inv_d, axis=-1)
        tx = jnp.min((hi_b - o) * inv_d, axis=-1)
        return jnp.maximum(te, 0.0), jnp.minimum(tx, t_leave)

    occ_flat = occ.reshape(-1)
    sd_flat = skip_dist.reshape(-1) if skip_dist is not None else None
    n = ray_o.shape[0]

    class S(NamedTuple):
        it: jnp.ndarray
        cell: jnp.ndarray
        t_max: jnp.ndarray
        t_cur: jnp.ndarray
        hit: jnp.ndarray
        hit_cell: jnp.ndarray
        alive: jnp.ndarray

    def cond(s: S):
        return (s.it < max_steps) & jnp.any(s.alive)

    def body(s: S) -> S:
        in_box = jnp.all((s.cell >= 0) & (s.cell < jnp.array([D, H, W])),
                         axis=-1)
        flat = jnp.clip((s.cell[:, 0] * H + s.cell[:, 1]) * W + s.cell[:, 2],
                        0, D * H * W - 1)
        occ_here = occ_flat[flat] & in_box
        new_hit = s.alive & occ_here & ~s.hit
        hit = s.hit | new_hit
        hit_cell = jnp.where(new_hit[:, None], s.cell, s.hit_cell)
        adv = s.alive & ~hit

        # standard DDA step
        axis = jnp.argmin(s.t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        t_next = jnp.min(s.t_max, axis=-1)
        cell_s = s.cell + onehot * step
        t_max_s = s.t_max + onehot.astype(jnp.float32) * t_delta

        if sd_flat is not None:
            # empty-space skip: jump (dist-1) L1 cells parametrically
            sdist = sd_flat[flat].astype(jnp.float32)
            can_jump = adv & (sdist >= 2.0) & in_box
            t_jump = s.t_cur + (sdist - 1.0) / jnp.maximum(l1_speed, 1e-9)
            pos_j = o + d * (t_jump[:, None] + 1e-5)
            cell_j = jnp.floor(pos_j).astype(jnp.int32)
            cell_new = jnp.where(can_jump[:, None], cell_j, cell_s)
            t_max_new = jnp.where(can_jump[:, None], t_max_of(cell_new),
                                  t_max_s)
            t_cur_new = jnp.where(can_jump, t_jump, t_next)
        else:
            cell_new, t_max_new, t_cur_new = cell_s, t_max_s, t_next

        cell = jnp.where(adv[:, None], cell_new, s.cell)
        t_max = jnp.where(adv[:, None], t_max_new, s.t_max)
        t_cur = jnp.where(adv, t_cur_new, s.t_cur)
        alive = adv & (t_cur < t_leave) & \
            jnp.all((cell >= 0) & (cell < jnp.array([D, H, W])), axis=-1)
        return S(s.it + 1, cell, t_max, t_cur, hit, hit_cell, alive)

    init = S(it=jnp.int32(0), cell=cell0, t_max=t_max_of(cell0),
             t_cur=t_enter, hit=jnp.zeros(n, bool),
             hit_cell=jnp.zeros((n, 3), jnp.int32), alive=alive0)
    out = jax.lax.while_loop(cond, body, init)
    t_entry, t_exit = entry_exit_of(out.hit_cell)
    return RayHit(hit=out.hit, t_entry=jnp.where(out.hit, t_entry, 0.0),
                  t_exit=jnp.where(out.hit, t_exit, 0.0),
                  ijk=out.hit_cell + imn)


def raycast_grid(grid: Grid, batch_idx: int, ray_o: jnp.ndarray,
                 ray_d: jnp.ndarray, ijk_min, dense_dims,
                 attributes: dict[str, jnp.ndarray] | None = None,
                 max_steps: int | None = None):
    """First-hit raycast against one batch element of a sparse Grid.

    Densifies the crop [ijk_min, ijk_min + dense_dims) and marches it. Returns
    (RayHit, attrs) where attrs maps each attribute name to its value at the
    hit voxel (0 where miss). attributes values are [C, F] slot-aligned.
    """
    sub = Grid(ijk=grid.ijk[batch_idx:batch_idx + 1],
               mask=grid.mask[batch_idx:batch_idx + 1],
               keys=grid.keys[batch_idx:batch_idx + 1],
               voxel_size=grid.voxel_size, origin=grid.origin)
    occ = occupancy_dense(sub, ijk_min, dense_dims)[0]
    hitres = dda_first_hit(occ, ray_o, ray_d, grid.voxel_size, grid.origin,
                           ijk_min, max_steps=max_steps)
    attrs = {}
    if attributes:
        idx = sub.ijk_to_index(hitres.ijk[None], hitres.hit[None])[0]
        for name, val in attributes.items():
            got = val[jnp.clip(idx, 0)]
            attrs[name] = jnp.where((idx >= 0)[:, None]
                                    if got.ndim > 1 else (idx >= 0), got, 0)
    return hitres, attrs


def dense_attribute_lookup(grid: Grid, data: jnp.ndarray, ijk_min, dense_dims):
    """Precompute a dense attribute block once for repeated per-frame raycasts
    (avoids the reference's per-frame grid rebuild, fvdb_utils.py:578-587)."""
    return to_dense(grid, data, ijk_min, dense_dims)
