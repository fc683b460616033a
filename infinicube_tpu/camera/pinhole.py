"""Pinhole camera (host-side config object + pure-JAX ray/projection math).

Behavioral mirror of the reference's PinholeCamera
(/root/reference/infinicube/camera/pinhole.py:22-211): OpenCV camera frame,
rays generated through integer pixel coordinates and L2-normalized, so
"distance" maps are Euclidean and z-depth = distance * cos(angle to optical
axis). Intrinsics live as Python floats (static under jit); functional variants
that take intrinsics as traced arrays are in camera.projection.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    fx: float
    fy: float
    cx: float
    cy: float
    w: int
    h: int

    @classmethod
    def from_intrinsics_matrix(cls, K, w: int, h: int) -> "PinholeCamera":
        K = np.asarray(K)
        return cls(float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]),
                   int(w), int(h))

    @property
    def width(self) -> int:
        return self.w

    @property
    def height(self) -> int:
        return self.h

    def intrinsics_matrix(self) -> jnp.ndarray:
        return jnp.array([[self.fx, 0.0, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]], jnp.float32)

    def rescale(self, scale: float | None = None, *, w: int | None = None,
                h: int | None = None) -> "PinholeCamera":
        """Return a camera for a resized image (reference pinhole.py:65)."""
        if scale is not None:
            w, h = round(self.w * scale), round(self.h * scale)
        sx, sy = w / self.w, h / self.h
        return PinholeCamera(self.fx * sx, self.fy * sy, self.cx * sx,
                             self.cy * sy, w, h)

    # ---- rays -------------------------------------------------------------
    def get_rays(self) -> jnp.ndarray:
        """f32[H, W, 3] normalized camera-frame ray directions (OpenCV)."""
        u = jnp.arange(self.w, dtype=jnp.float32)
        v = jnp.arange(self.h, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(u, v, indexing="xy")
        d = jnp.stack([(uu - self.cx) / self.fx, (vv - self.cy) / self.fy,
                       jnp.ones_like(uu)], axis=-1)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def get_rays_posed(self, poses: jnp.ndarray):
        """poses f32[N, 4, 4] camera-to-world (OpenCV camera frame) ->
        (ray_o [N, H, W, 3], ray_d [N, H, W, 3]) in world."""
        rays = self.get_rays()
        ray_d = jnp.einsum("nij,hwj->nhwi", poses[:, :3, :3], rays)
        ray_o = jnp.broadcast_to(poses[:, None, None, :3, 3], ray_d.shape)
        return ray_o, ray_d

    # ---- pixel <-> ray ----------------------------------------------------
    def pixel2ray(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels (..., 2) -> un-normalized rays (..., 3) at z=1."""
        x = (pixels[..., 0] - self.cx) / self.fx
        y = (pixels[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def ray2pixel(self, rays: jnp.ndarray) -> jnp.ndarray:
        """rays (..., 3) camera frame -> pixel coords (..., 2)."""
        z = rays[..., 2]
        return jnp.stack([rays[..., 0] / z * self.fx + self.cx,
                          rays[..., 1] / z * self.fy + self.cy], axis=-1)

    # ---- depth conversions (reference base.py:350-374) ---------------------
    def distance_to_zdepth(self, distance: jnp.ndarray) -> jnp.ndarray:
        """distance [H, W] (Euclidean along normalized ray) -> z-depth."""
        return distance * self.get_rays()[..., 2]

    def zdepth_to_distance(self, zdepth: jnp.ndarray) -> jnp.ndarray:
        return zdepth / self.get_rays()[..., 2]
