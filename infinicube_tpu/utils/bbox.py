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


# ---------------------------------------------------------------------------
# exact oriented-box overlap (pytorch3d box3d_overlap replacement, SURVEY
# §2.1 N5; used by the reference for healthy-box validation and conditioning
# cube overlap checks)
# ---------------------------------------------------------------------------

def _clip_polygon_halfspace(poly: np.ndarray, n: np.ndarray, d: float):
    """Sutherland-Hodgman: clip a 3D polygon to {x: n.x <= d}."""
    if len(poly) == 0:
        return poly
    dist = poly @ n - d
    out = []
    k = len(poly)
    for i in range(k):
        a, b = poly[i], poly[(i + 1) % k]
        da, db = dist[i], dist[(i + 1) % k]
        if da <= 0:
            out.append(a)
        if (da <= 0) != (db <= 0):
            t = da / (da - db)
            out.append(a + t * (b - a))
    return np.asarray(out) if out else np.zeros((0, 3))


_FACE_IDX = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]


def _box_faces(lwh, pose):
    c = np.asarray(corners_from_lwh_pose(lwh, pose))
    return [c[list(f)] for f in _FACE_IDX]


def _box_halfspaces(lwh, pose):
    """6 half-spaces (n, d) with n.x <= d inside."""
    pose = np.asarray(pose, np.float64)
    R, t = pose[:3, :3], pose[:3, 3]
    half = np.asarray(lwh, np.float64) / 2
    hs = []
    for axis in range(3):
        n = R[:, axis]
        c = n @ t
        hs.append((n, c + half[axis]))
        hs.append((-n, -(c - half[axis])))
    return hs


def _polyhedron_volume(faces: list) -> float:
    """Volume of the convex hull of the clipped boundary vertices (robust to
    duplicated/coincident faces, e.g. identical boxes)."""
    allv = np.unique(np.round(np.concatenate(faces, axis=0), 9), axis=0)
    if len(allv) < 4:
        return 0.0
    try:
        from scipy.spatial import ConvexHull
        return float(ConvexHull(allv, qhull_options="QJ").volume)
    except Exception:
        return 0.0


def box3d_overlap(lwh1, pose1, lwh2, pose2):
    """Exact intersection volume + IoU of two oriented boxes
    (pytorch3d.ops.box3d_overlap semantics). Returns (volume, iou)."""
    faces = _box_faces(lwh1, pose1)
    hs2 = _box_halfspaces(lwh2, pose2)
    # clip box1's faces by box2's half-spaces; collect cap faces from the
    # clipped cross-sections of box2's faces against box1
    clipped = []
    for f in faces:
        g = f
        for n, d in hs2:
            g = _clip_polygon_halfspace(g, n, d)
            if len(g) == 0:
                break
        if len(g) >= 3:
            clipped.append(g)
    hs1 = _box_halfspaces(lwh1, pose1)
    for f in _box_faces(lwh2, pose2):
        g = f
        for n, d in hs1:
            g = _clip_polygon_halfspace(g, n, d)
            if len(g) == 0:
                break
        if len(g) >= 3:
            clipped.append(g)
    if not clipped:
        return 0.0, 0.0
    vol = _polyhedron_volume(clipped)
    v1 = float(np.prod(lwh1))
    v2 = float(np.prod(lwh2))
    union = v1 + v2 - vol
    return vol, (vol / union if union > 0 else 0.0)
