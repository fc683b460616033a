"""Offscreen scene rendering for the visualization tools.

The reference's viewers are viser-based interactive apps
(/root/reference/infinicube/visualize/ + utils/record_utils.py,
viser_gui_utils.py); viser is not in this image, so the console tools render
offscreen (voxel point splatting through the camera core; Gaussian scenes
through the Pallas-path rasterizer) and the interactive paths are gated
behind ``import viser``."""

from __future__ import annotations

import numpy as np

from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.utils.semantic import semantic_to_color

HAS_VISER = False
try:  # pragma: no cover - optional dependency
    import viser  # noqa: F401
    HAS_VISER = True
except ImportError:
    pass


def orbit_poses(center: np.ndarray, radius: float, height: float,
                n: int = 8) -> np.ndarray:
    """n OpenCV camera-to-world poses orbiting ``center`` looking inward."""
    out = []
    for a in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = center + np.array([radius * np.cos(a), radius * np.sin(a),
                                 height])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
        out.append(T)
    return np.asarray(out)


def render_voxel_points(ijk: np.ndarray, semantics: np.ndarray, voxel_size,
                        origin, pose: np.ndarray,
                        camera: PinholeCamera | None = None) -> np.ndarray:
    """uint8 [H, W, 3] painter's-algorithm voxel-point render."""
    import jax.numpy as jnp
    from infinicube_tpu.camera import projection as proj
    camera = camera or PinholeCamera(fx=300.0, fy=300.0, cx=320, cy=240,
                                     w=640, h=480)
    pts = np.asarray(ijk, np.float64) * np.asarray(voxel_size) + \
        np.asarray(origin)
    colors = semantic_to_color(np.asarray(semantics))
    img = proj.draw_points(
        jnp.asarray(colors, jnp.float32), jnp.asarray(pts, jnp.float32),
        jnp.ones(len(pts), bool), jnp.asarray(pose, jnp.float32),
        camera.intrinsics_matrix(), (camera.h, camera.w), background=1.0)
    return (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)


def render_gaussian_scene(gdict: dict, pose: np.ndarray,
                          camera: PinholeCamera | None = None,
                          background=(1.0, 1.0, 1.0)) -> np.ndarray:
    """uint8 render of a gaussian dict through the TPU rasterizer
    (replaces the client-side gsplat render of vis-dynamic)."""
    import jax.numpy as jnp
    from infinicube_tpu.camera.conventions import invert_pose
    from infinicube_tpu.ops.gsplat import render_gaussians
    camera = camera or PinholeCamera(fx=300.0, fy=300.0, cx=320, cy=240,
                                     w=640, h=480)
    color, alpha, _ = render_gaussians(
        jnp.asarray(gdict["means"]), jnp.asarray(gdict["quats"]),
        jnp.asarray(gdict["scales"]), jnp.asarray(gdict["opacities"]),
        jnp.asarray(gdict["colors"]),
        invert_pose(jnp.asarray(pose, jnp.float32)),
        camera.intrinsics_matrix(), (camera.h, camera.w),
        background=jnp.asarray(background))
    return (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8)


def transform_gaussians(gdict: dict, transform: np.ndarray) -> dict:
    """Rigidly move a gaussian set (per-timestep object transforms of
    vis-dynamic)."""
    from infinicube_tpu.utils.interpolate import rot_to_quat, quat_to_rot
    out = dict(gdict)
    R = np.asarray(transform)[:3, :3]
    out["means"] = gdict["means"] @ R.T + transform[:3, 3]
    qr = rot_to_quat(R)

    def qmul(q1, q2):
        w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
        w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
        return np.stack([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                         w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                         w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                         w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1)

    out["quats"] = qmul(np.broadcast_to(qr, gdict["quats"].shape),
                        gdict["quats"])
    return out
