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


def sample_cubemap(faces, dirs):
    """Bilinear cubemap lookup. faces [6, S, S, C]; dirs (..., 3)
    (reference sample_cubemap_from_camera:306-356)."""
    xp = _xp(dirs)
    n = dirs / xp.clip(xp.linalg.norm(dirs, axis=-1, keepdims=True),
                       1e-8, None)
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    ax, ay, az = xp.abs(x), xp.abs(y), xp.abs(z)
    # dominant axis -> face id matching cubemap_face_uv_to_direction
    face = xp.where(
        (ax >= ay) & (ax >= az), xp.where(x > 0, 0, 1),
        xp.where(ay >= az, xp.where(y > 0, 2, 3), xp.where(z > 0, 4, 5)))
    # per-face uv (inverse of cubemap_face_uv_to_direction)
    denom = xp.where((ax >= ay) & (ax >= az), ax,
                     xp.where(ay >= az, ay, az))
    xs, ys, zs = x / denom, y / denom, z / denom
    a = xp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-ys, ys, xs, -xs, ys, ys])
    b = xp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-zs, -zs, -zs, -zs, xs, -xs])
    uv = xp.stack([(a + 1) / 2, (b + 1) / 2], -1)
    S = faces.shape[1]
    u = xp.clip(uv[..., 0] * (S - 1), 0, S - 1.001)
    v = xp.clip(uv[..., 1] * (S - 1), 0, S - 1.001)
    u0 = xp.floor(u).astype(xp.int32)
    v0 = xp.floor(v).astype(xp.int32)
    du, dv = (u - u0)[..., None], (v - v0)[..., None]
    u1, v1 = xp.minimum(u0 + 1, S - 1), xp.minimum(v0 + 1, S - 1)
    g = lambda vv, uu: faces[face, vv, uu]
    return (g(v0, u0) * (1 - du) * (1 - dv) + g(v0, u1) * du * (1 - dv) +
            g(v1, u0) * (1 - du) * dv + g(v1, u1) * du * dv)


def camera_dirs_from_fov(camera_to_world, height, width, vfov, hfov):
    """FLU world ray directions through a FoV-specified pinhole
    (reference build_pose_and_intrinsic_tensor:477-502 + rays)."""
    fx = width / (2 * np.tan(np.radians(hfov) / 2))
    fy = height / (2 * np.tan(np.radians(vfov) / 2))
    u = np.arange(width) + 0.5
    v = np.arange(height) + 0.5
    uu, vv = np.meshgrid(u, v, indexing="xy")
    # OpenCV cam dirs -> world via pose
    d_cam = np.stack([(uu - width / 2) / fx, (vv - height / 2) / fy,
                      np.ones_like(uu)], -1)
    R = np.asarray(camera_to_world)[:3, :3]
    d = d_cam @ R.T
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def read_skybox(gaussian_model_path, white_bg: bool = False) -> dict:
    """Read the skybox representation saved beside a gaussian model
    (reference read_skybox:504-595). Recognized siblings of
    ``<stem>.{ply,pkl,splat}``:
      <stem>_pano.npz / _pano.png (+ _pano_mask.png)  -> rgb_panorama
      <stem>_cubemap.npz (faces [6,S,S,3])            -> rgb_cubemap
      <stem>_sky_token.npy + _modulator.npz           -> sky_modulator
    Fallback: black panorama (white when white_bg)."""
    from pathlib import Path
    stem = Path(gaussian_model_path).with_suffix("")
    if white_bg:
        return {"type": "rgb_panorama",
                "panorama": np.ones((64, 128, 3), np.float32),
                "panorama_mask": np.zeros((64, 128), np.float32)}
    pano_npz = stem.parent / (stem.name + "_pano.npz")
    pano_png = stem.parent / (stem.name + "_pano.png")
    cubemap = stem.parent / (stem.name + "_cubemap.npz")
    token = stem.parent / (stem.name + "_sky_token.npy")
    modulator = stem.parent / (stem.name + "_modulator.npz")
    if pano_npz.exists() or pano_png.exists():
        if pano_npz.exists():
            pano = np.load(pano_npz)["panorama"].astype(np.float32)
        else:
            from infinicube_tpu.data.codec import decode_member
            pano = np.asarray(decode_member(
                "png", pano_png.read_bytes()), np.float32) / 255.0
        mask_p = stem.parent / (stem.name + "_pano_mask.png")
        if mask_p.exists():
            from infinicube_tpu.data.codec import decode_member
            mask = np.asarray(decode_member(
                "png", mask_p.read_bytes()), np.float32) / 255.0
        else:
            mask = np.zeros(pano.shape[:2], np.float32)
        return {"type": "rgb_panorama", "panorama": pano,
                "panorama_mask": mask}
    if cubemap.exists():
        return {"type": "rgb_cubemap",
                "cubemap": np.load(cubemap)["faces"].astype(np.float32)}
    if token.exists() and modulator.exists():
        loaded = np.load(modulator, allow_pickle=True)
        return {"type": "sky_modulator",
                "sky_token": np.load(token),
                "modulator_params": loaded["params"].item()
                if "params" in loaded else dict(loaded)}
    return {"type": "rgb_panorama",
            "panorama": np.zeros((64, 128, 3), np.float32),
            "panorama_mask": np.zeros((64, 128), np.float32)}


def render_sky_api(skybox_dict: dict, camera_to_world, height: int,
                   width: int, vfov: float, hfov: float) -> np.ndarray:
    """Render the sky for one camera (reference render_sky_api:597-640):
    dispatches on the skybox type; panorama shape H x 4H = skylatlong
    (hemisphere), H x 2H = full latlong."""
    dirs = camera_dirs_from_fov(camera_to_world, height, width, vfov, hfov)
    kind = skybox_dict["type"]
    if kind == "rgb_panorama":
        pano = skybox_dict["panorama"]
        mapping = "skylatlong" if pano.shape[1] == 4 * pano.shape[0] \
            else "latlong"
        return np.asarray(sample_panorama(pano, dirs, mapping)).clip(0, 1)
    if kind == "rgb_cubemap":
        return np.asarray(
            sample_cubemap(skybox_dict["cubemap"], dirs)).clip(0, 1)
    if kind == "sky_modulator":
        import jax.numpy as jnp
        from infinicube_tpu.models.gsm.sky import SkyboxMlpModulator, SkyConfig
        mod = SkyboxMlpModulator(skybox_dict.get("config") or SkyConfig())
        rgb = mod.apply({"params": skybox_dict["modulator_params"]},
                        jnp.asarray(skybox_dict["sky_token"]),
                        jnp.asarray(dirs), method=SkyboxMlpModulator.sample)
        return np.asarray(rgb).clip(0, 1)
    raise NotImplementedError(kind)
