"""Oriented 3D bounding-box utilities.

Behavioral mirror of the reference's bbox helpers
(/root/reference/infinicube/utils/bbox_utils.py:22-72,
voxelgen/utils/box_util.get_points_in_cuboid_torch): lwh+pose -> 8 corners,
point-in-OBB tests (which also replace the exact pytorch3d box3d_overlap used
for instance-id stamping — SURVEY.md §7.4 approximation note).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# corner order: all sign combinations of (±l/2, ±w/2, ±h/2) in row-major
_SIGNS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                   for sz in (-1, 1)], np.float32)


def corners_from_lwh_pose(lwh, object_to_world):
    """lwh (..., 3), object_to_world (..., 4, 4) -> corners (..., 8, 3) world.
    The canonical box is axis-aligned, centered at the object origin."""
    xp = jnp if isinstance(lwh, jnp.ndarray) else np
    half = xp.asarray(lwh)[..., None, :] * 0.5 * _SIGNS  # (..., 8, 3)
    R = object_to_world[..., :3, :3]
    t = object_to_world[..., :3, 3]
    return half @ xp.swapaxes(R, -1, -2) + t[..., None, :]


def points_in_obb(points, object_to_world, lwh, enlarge: float = 1.0):
    """bool mask of points (..., N, 3) inside the oriented box.

    Transforms points into the object frame and tests |p| <= lwh/2 * enlarge
    (reference enlarge_lwh_factor=1.2 in buffer generation, fvdb_utils.py:401)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    R = object_to_world[..., :3, :3]
    t = object_to_world[..., :3, 3]
    local = (points - t[..., None, :]) @ R  # R^T applied from the right
    half = xp.asarray(lwh) * 0.5 * enlarge
    return xp.all(xp.abs(local) <= half[..., None, :], axis=-1)


def assign_instance_ids(points, semantics, object_poses, object_lwhs,
                        object_ids, car_like_ids, enlarge: float = 1.2):
    """Stamp instance ids onto car-like scene points by point-in-OBB test
    (reference get_instance_id_for_fvdb_scene_points, fvdb_utils.py:299-385).

    points f32[N, 3] world; semantics int[N]; object_poses f32[M, 4, 4];
    object_lwhs f32[M, 3]; object_ids int[M]. Later boxes win on overlap.
    Returns int32[N] (0 = no instance)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    car_mask = xp.zeros(points.shape[0], dtype=bool)
    for cid in car_like_ids:
        car_mask = car_mask | (semantics == cid)
    inst = xp.zeros(points.shape[0], dtype=np.int32)
    for m in range(object_poses.shape[0]):
        inside = points_in_obb(points, object_poses[m], object_lwhs[m], enlarge)
        sel = inside & car_mask
        if xp is np:
            inst[sel] = int(object_ids[m])
        else:
            inst = xp.where(sel, object_ids[m].astype(jnp.int32), inst)
    return inst


def crop_points_aabb(points, bbox_min, bbox_max):
    """bool mask of points inside an axis-aligned box (reference
    bbox_utils.py:72 AABB crop)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    return xp.all((points >= xp.asarray(bbox_min)) &
                  (points <= xp.asarray(bbox_max)), axis=-1)
