"""Coordinate-frame conventions.

Two frames are used throughout (mirroring the reference's conventions,
/root/reference/infinicube/camera/base.py:28-115):

- **OpenCV / RDF**: x right, y down, z forward (camera frame).
- **FLU**: x forward, y left, z up (ego/world frame; Waymo vehicle frame).

A pose matrix ``T`` (4x4) maps camera-frame points to world:
``p_world = T[:3, :3] @ p_cam + T[:3, 3]``. Converting the *convention* of a
pose is a column permutation of its rotation block:
FLU basis (f, l, u) expressed via OpenCV basis (r, d, fwd): f = fwd, l = -r,
u = -d.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def opencv_to_flu(pose):
    """Re-express a camera-to-world pose whose camera frame is OpenCV as one
    whose camera frame is FLU. pose (..., 4, 4)."""
    xp = _xp(pose)
    return xp.concatenate(
        [pose[..., 2:3], -pose[..., 0:1], -pose[..., 1:2], pose[..., 3:4]], axis=-1)


def flu_to_opencv(pose):
    """Inverse of opencv_to_flu. pose (..., 4, 4)."""
    xp = _xp(pose)
    return xp.concatenate(
        [-pose[..., 1:2], -pose[..., 2:3], pose[..., 0:1], pose[..., 3:4]], axis=-1)


def transform_points(points, tfm):
    """Apply a rigid transform. points (..., N, 3), tfm (..., 4, 4)."""
    return points @ _swap(tfm[..., :3, :3]) + tfm[..., None, :3, 3]


def _swap(m):
    xp = _xp(m)
    return xp.swapaxes(m, -1, -2)


def invert_pose(tfm):
    """Invert a rigid 4x4 transform analytically."""
    xp = _xp(tfm)
    r = _swap(tfm[..., :3, :3])
    t = -(r @ tfm[..., :3, 3:4])
    top = xp.concatenate([r, t], axis=-1)
    bot = xp.broadcast_to(xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=tfm.dtype),
                          tfm[..., :1, :].shape)
    return xp.concatenate([top, bot], axis=-2)
