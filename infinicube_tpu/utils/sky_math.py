"""Panorama / sky direction math.

Mirror of the reference's sky utilities
(/root/reference/infinicube/utils/sky_utils.py:70-356): direction <->
lat-long / skylatlong UV mappings and per-camera panorama sampling.
Directions are FLU world vectors (x forward, y left, z up)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def direction_to_latlong_uv(d):
    """Unit directions (..., 3) -> equirect uv in [0,1]^2. u wraps azimuth
    (atan2(y, x)), v maps zenith: z=+1 (up) -> v=0."""
    xp = _xp(d)
    n = d / xp.clip(xp.linalg.norm(d, axis=-1, keepdims=True), 1e-8, None)
    az = xp.arctan2(n[..., 1], n[..., 0])          # [-pi, pi]
    el = xp.arccos(xp.clip(n[..., 2], -1.0, 1.0))  # [0, pi], 0 = up
    u = (az + np.pi) / (2 * np.pi)
    v = el / np.pi
    return xp.stack([u, v], axis=-1)


def latlong_uv_to_direction(uv):
    """Inverse of direction_to_latlong_uv."""
    xp = _xp(uv)
    az = uv[..., 0] * (2 * np.pi) - np.pi
    el = uv[..., 1] * np.pi
    s = xp.sin(el)
    return xp.stack([s * xp.cos(az), s * xp.sin(az), xp.cos(el)], axis=-1)


def direction_to_skylatlong_uv(d):
    """Sky-only variant: v spans just the upper hemisphere (z >= 0)."""
    xp = _xp(d)
    n = d / xp.clip(xp.linalg.norm(d, axis=-1, keepdims=True), 1e-8, None)
    az = xp.arctan2(n[..., 1], n[..., 0])
    el = xp.arccos(xp.clip(n[..., 2], 0.0, 1.0))   # clamp below horizon
    u = (az + np.pi) / (2 * np.pi)
    v = el / (np.pi / 2)
    return xp.stack([u, v], axis=-1)


def sample_panorama(pano, dirs, mapping: str = "latlong"):
    """Bilinear panorama lookup. pano [H, W, C]; dirs (..., 3)."""
    xp = _xp(dirs)
    H, W = pano.shape[:2]
    uv = direction_to_latlong_uv(dirs) if mapping == "latlong" else \
        direction_to_skylatlong_uv(dirs)
    u = xp.clip(uv[..., 0] * (W - 1), 0, W - 1.001)
    v = xp.clip(uv[..., 1] * (H - 1), 0, H - 1.001)
    u0 = xp.floor(u).astype(xp.int32)
    v0 = xp.floor(v).astype(xp.int32)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u1 = xp.minimum(u0 + 1, W - 1)
    v1 = xp.minimum(v0 + 1, H - 1)
    return (pano[v0, u0] * (1 - du) * (1 - dv) + pano[v0, u1] * du * (1 - dv)
            + pano[v1, u0] * (1 - du) * dv + pano[v1, u1] * du * dv)


def render_panorama(sample_fn, hw: tuple[int, int] = (256, 512),
                    mapping: str = "latlong"):
    """Bake a sky model into an equirect panorama image
    (the reference's skybox save path, sky_utils.py:504-640).
    sample_fn(dirs (..., 3)) -> rgb (..., 3)."""
    H, W = hw
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v, indexing="xy")
    uv = np.stack([uu, vv], -1)
    if mapping == "skylatlong":
        uv = uv.copy()
        uv[..., 1] *= 0.5  # upper hemisphere only
    dirs = latlong_uv_to_direction(uv)
    return np.asarray(sample_fn(dirs))


def save_skybox(path, pano: np.ndarray):
    """Persist a baked panorama (npz + preview png)."""
    from pathlib import Path
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, panorama=np.asarray(pano, np.float32))


def load_skybox(path) -> np.ndarray:
    return np.load(path)["panorama"]


def cubemap_face_uv_to_direction(face: int, uv):
    """Cubemap face (+x,-x,+y,-y,+z,-z = 0..5) + uv in [0,1]^2 -> direction."""
    xp = _xp(uv)
    a = uv[..., 0] * 2 - 1
    b = uv[..., 1] * 2 - 1
    one = xp.ones_like(a)
    table = [
        lambda: xp.stack([one, -a, -b], -1),
        lambda: xp.stack([-one, a, -b], -1),
        lambda: xp.stack([a, one, -b], -1),
        lambda: xp.stack([-a, -one, -b], -1),
        lambda: xp.stack([b, a, one], -1),
        lambda: xp.stack([-b, a, -one], -1),
    ]
    d = table[face]()
    return d / xp.clip(xp.linalg.norm(d, axis=-1, keepdims=True), 1e-8, None)
