"""Functional projection ops (traced intrinsics/poses, jit/vmap friendly).

Mirrors the reference's CameraBase tensor ops
(/root/reference/infinicube/camera/base.py): point projection, z-depth maps
from point clouds via per-pixel min reduction (base.py:386-447), point/polyline
drawing used for conditioning visualizations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from infinicube_tpu.camera.conventions import invert_pose, transform_points


def project_points(points: jnp.ndarray, cam_to_world: jnp.ndarray,
                   K: jnp.ndarray, image_hw: tuple[int, int]):
    """Project world points into a camera.

    points f32[N, 3]; cam_to_world f32[4, 4] (OpenCV camera frame); K f32[3,3].
    Returns (uv f32[N, 2], z f32[N], valid bool[N]) with valid = in front of
    camera and inside the image.
    """
    h, w = image_hw
    pc = transform_points(points, invert_pose(cam_to_world))
    z = pc[..., 2]
    inv_z = jnp.where(z > 1e-6, 1.0 / jnp.maximum(z, 1e-6), 0.0)
    u = pc[..., 0] * inv_z * K[0, 0] + K[0, 2]
    v = pc[..., 1] * inv_z * K[1, 1] + K[1, 2]
    uv = jnp.stack([u, v], axis=-1)
    valid = (z > 1e-6) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return uv, z, valid


def zdepth_map_from_points(points: jnp.ndarray, point_mask: jnp.ndarray,
                           cam_to_world: jnp.ndarray, K: jnp.ndarray,
                           image_hw: tuple[int, int]) -> jnp.ndarray:
    """Per-pixel minimum z of projected points; 0 where empty.

    (reference get_zdepth_map_from_points, base.py:386-447: scatter-amin)."""
    h, w = image_hw
    uv, z, valid = project_points(points, cam_to_world, K, (h, w))
    valid = valid & point_mask
    px = jnp.clip(uv[..., 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(uv[..., 1].astype(jnp.int32), 0, h - 1)
    flat = jnp.where(valid, py * w + px, h * w)
    big = jnp.full((h * w,), jnp.inf, jnp.float32)
    zmap = big.at[flat].min(jnp.where(valid, z, jnp.inf), mode="drop")
    return jnp.where(jnp.isfinite(zmap), zmap, 0.0).reshape(h, w)


def draw_points(values: jnp.ndarray, points: jnp.ndarray, point_mask: jnp.ndarray,
                cam_to_world: jnp.ndarray, K: jnp.ndarray,
                image_hw: tuple[int, int], background=0.0):
    """Painter's-algorithm point drawing (nearest point wins per pixel,
    reference base.py:624-722). values [N, F] -> image [H, W, F]."""
    h, w = image_hw
    uv, z, valid = project_points(points, cam_to_world, K, (h, w))
    valid = valid & point_mask
    px = jnp.clip(uv[..., 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(uv[..., 1].astype(jnp.int32), 0, h - 1)
    flat = jnp.where(valid, py * w + px, h * w)
    # nearest-z point wins: scatter-min z, then scatter values where z matches
    big = jnp.full((h * w,), jnp.inf, jnp.float32)
    zmin = big.at[flat].min(jnp.where(valid, z, jnp.inf), mode="drop")
    is_winner = valid & (z <= zmin[jnp.clip(flat, 0, h * w - 1)] + 1e-6)
    img = jnp.full((h * w, values.shape[-1]), background, values.dtype)
    img = img.at[jnp.where(is_winner, flat, h * w)].set(values, mode="drop")
    return img.reshape(h, w, values.shape[-1])


def polyline_to_points(polyline: jnp.ndarray, n_per_seg: int = 16) -> jnp.ndarray:
    """Densify a polyline [M, 3] into [M-1, n_per_seg, 3] sampled points
    (reference interpolate_utils polyline->points, base.py line drawing)."""
    a, b = polyline[:-1], polyline[1:]
    t = jnp.linspace(0.0, 1.0, n_per_seg)[None, :, None]
    return a[:, None, :] * (1 - t) + b[:, None, :] * t


def rays_from_intrinsics(K: jnp.ndarray, image_hw: tuple[int, int],
                         normalize: bool = True) -> jnp.ndarray:
    """f32[H, W, 3] camera-frame rays from a traced intrinsics matrix
    (reference render_util.create_rays_from_intrinsic_torch_batch)."""
    h, w = image_hw
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    d = jnp.stack([(uu - K[0, 2]) / K[0, 0], (vv - K[1, 2]) / K[1, 1],
                   jnp.ones_like(uu)], axis=-1)
    if normalize:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d


def posed_rays_from_intrinsics(K: jnp.ndarray, cam_to_world: jnp.ndarray,
                               image_hw: tuple[int, int], normalize: bool = True):
    """(ray_o, ray_d) [H, W, 3] world-space rays for one camera."""
    rays = rays_from_intrinsics(K, image_hw, normalize)
    ray_d = jnp.einsum("ij,hwj->hwi", cam_to_world[:3, :3], rays)
    ray_o = jnp.broadcast_to(cam_to_world[:3, 3], ray_d.shape)
    return ray_o, ray_d


def unproject_depth(zdepth: jnp.ndarray, K: jnp.ndarray,
                    cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """z-depth [H, W] -> world points [H, W, 3] (reference
    depth_utils.unproject_depth_torch:402; used by the coordinate buffer)."""
    h, w = zdepth.shape
    rays = rays_from_intrinsics(K, (h, w), normalize=False)  # z=1 rays
    pc = rays * zdepth[..., None]
    return jnp.einsum("ij,hwj->hwi", cam_to_world[:3, :3], pc) + cam_to_world[:3, 3]
