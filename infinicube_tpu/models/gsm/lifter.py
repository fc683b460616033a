"""Lifter + visibility utilities for the GSM voxel branch.

Mirrors the reference's one-voxel-per-ray feature unprojection
(/root/reference/infinicube/voxelgen/modules/gsm_modules/backbone/
voxel_branch.py:951-1075: ``voxels_along_rays(max_voxels=1)`` + scatter_mean)
and the occluded/visible split (``get_occ_front_voxel``,
voxelgen/utils/voxel_util.py:432-516).

Two implementations, selectable via ``impl``:
- "splat" (default): the packed-splat z-buffer (utils/buffers
  splat_winner_slots) resolves each pixel's front voxel with ONE
  scatter-min — measured ~20x faster than ray marching at GSM scale
  (lift+visibility was 2.06 s of a 3.75 s forward with DDA);
- "dda": exact first-hit ray march (golden path, used by tests)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from infinicube_tpu.camera import projection as proj
from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import occupancy_dense
from infinicube_tpu.ops.raycast import (
    dda_first_hit, manhattan_distance_transform)


def _hit_indices(grid: Grid, occ, ijk_min, ray_o, ray_d, skip=None):
    hit = dda_first_hit(occ, ray_o, ray_d, grid.voxel_size, grid.origin,
                        ijk_min, skip_dist=skip)
    idx = grid.ijk_to_index(hit.ijk[None], hit.hit[None])[0]
    return jnp.where(hit.hit, idx, -1)


def _splat_winners(grid: Grid, K, pose, hw):
    from infinicube_tpu.utils.buffers import splat_winner_slots
    centers = grid.voxel_centers()[0]
    # 0.75*vs (> half-diagonal of a voxel face): adjacent voxels' footprints
    # overlap by >= 1 px, so surfaces splat without pinholes
    radius = jnp.broadcast_to(0.75 * jnp.max(grid.voxel_size),
                              (grid.capacity,))
    win, _ = splat_winner_slots(centers, grid.mask[0], radius, K, pose, hw)
    return win.reshape(-1)


def lift_features(grid: Grid, feats: jnp.ndarray, Ks: jnp.ndarray,
                  cam_to_worlds: jnp.ndarray, ijk_min, dense_dims,
                  impl: str = "splat"):
    """Unproject per-pixel features onto first-hit voxels, averaged over all
    rays landing in a voxel (scatter_mean). Batch size 1 grid.

    feats f32[V, H, W, F]; Ks f32[V, 3, 3]; cam_to_worlds f32[V, 4, 4].
    Returns f32[1, C, F] voxel features."""
    V, H, W, F = feats.shape
    if impl != "splat":
        occ = occupancy_dense(grid, ijk_min, dense_dims)[0]
        skip = manhattan_distance_transform(occ)
    C = grid.capacity

    def per_view(K, pose, f):
        if impl == "splat":
            idx = _splat_winners(grid, K, pose, (H, W))
        else:
            ro, rd = proj.posed_rays_from_intrinsics(K, pose, (H, W))
            idx = _hit_indices(grid, occ, ijk_min, ro.reshape(-1, 3),
                               rd.reshape(-1, 3), skip)
        fl = f.reshape(-1, F)
        safe = jnp.where(idx >= 0, idx, C)
        s = jnp.zeros((C + 1, F)).at[safe].add(
            jnp.where((idx >= 0)[:, None], fl, 0.0))
        cnt = jnp.zeros((C + 1,)).at[safe].add((idx >= 0).astype(jnp.float32))
        return s[:C], cnt[:C]

    sums, counts = jax.vmap(per_view)(Ks, cam_to_worlds, feats)
    s = sums.sum(0)
    c = counts.sum(0)
    out = s / jnp.maximum(c[:, None], 1.0)
    return jnp.where((grid.mask[0] & (c > 0))[None, :, None], out[None], 0.0)


def visible_voxel_mask(grid: Grid, Ks: jnp.ndarray, cam_to_worlds: jnp.ndarray,
                       ijk_min, dense_dims, ray_hw: tuple[int, int] = (192, 320),
                       impl: str = "splat") -> jnp.ndarray:
    """bool[1, C]: voxels hit first by any camera ray (the reference's
    occ-front visible set, voxel_util.py:432 with max_height=2400 pseudo
    resolution — here a configurable raycast resolution)."""
    if impl != "splat":
        occ = occupancy_dense(grid, ijk_min, dense_dims)[0]
        skip = manhattan_distance_transform(occ)

    def per_view(K, pose):
        h, w = ray_hw
        Ks_scaled = K.at[0].mul(w / (2.0 * K[0, 2])).at[1].mul(
            h / (2.0 * K[1, 2]))
        if impl == "splat":
            idx = _splat_winners(grid, Ks_scaled, pose, ray_hw)
        else:
            ro, rd = proj.posed_rays_from_intrinsics(Ks_scaled, pose, ray_hw)
            idx = _hit_indices(grid, occ, ijk_min, ro.reshape(-1, 3),
                               rd.reshape(-1, 3), skip)
        vis = jnp.zeros((grid.capacity + 1,), bool).at[
            jnp.where(idx >= 0, idx, grid.capacity)].set(True)
        return vis[:grid.capacity]

    vis = jax.vmap(per_view)(Ks, cam_to_worlds).any(0)
    return (vis & grid.mask[0])[None]


def voxel_depth_prior(grid: Grid, Ks: jnp.ndarray, cam_to_worlds: jnp.ndarray,
                      ijk_min, dense_dims, image_hw,
                      impl: str = "splat") -> jnp.ndarray:
    """Per-view z-depth rendered from the voxel grid — the pixel branch's
    ``voxel_depth`` prior (reference dav2_encoder.get_voxel_depth:35-155 /
    gsm voxel_preprocess). Returns f32[V, H, W, 1] (0 = no hit)."""
    h, w = image_hw
    if impl == "splat":
        from infinicube_tpu.utils.buffers import splat_winner_slots
        centers = grid.voxel_centers()[0]
        radius = jnp.broadcast_to(0.75 * jnp.max(grid.voxel_size),
                                  (grid.capacity,))

        def per_view(K, pose):
            _, zd = splat_winner_slots(centers, grid.mask[0], radius, K,
                                       pose, image_hw)
            return zd[..., None]

        return jax.vmap(per_view)(Ks, cam_to_worlds)

    occ = occupancy_dense(grid, ijk_min, dense_dims)[0]
    skip = manhattan_distance_transform(occ)

    def per_view(K, pose):
        ro, rd = proj.posed_rays_from_intrinsics(K, pose, image_hw)
        hit = dda_first_hit(occ, ro.reshape(-1, 3), rd.reshape(-1, 3),
                            grid.voxel_size, grid.origin, ijk_min,
                            skip_dist=skip)
        cos = rd.reshape(-1, 3) @ pose[:3, 2]
        return jnp.where(hit.hit, hit.t_entry * cos, 0.0).reshape(h, w, 1)

    return jax.vmap(per_view)(Ks, cam_to_worlds)


def sample_image_features(points: jnp.ndarray, feats: jnp.ndarray,
                          Ks: jnp.ndarray, cam_to_worlds: jnp.ndarray):
    """Project world points into every view and max-pool bilinear features
    (the hybrid-head multi-view sampling, voxel_branch.py:806-848).

    points f32[P, 3]; feats f32[V, H, W, F] -> f32[P, F].

    Views run as a ``lax.scan`` with a running max, NOT a vmap: a vmapped
    gather materializes the [V*P, F] bilinear temps all at once, and at
    release inference scale (16 views x 1M gaussians x F=64, which pads
    2x onto 128 lanes) that is 2 x 8 GB of HLO temp — a measured HBM OOM.
    The scan peak is one view's [P, F]."""
    V, H, W, F = feats.shape

    NEG = -7.0e37   # finite masked-max sentinel (see grid/ops._NEG_SENTINEL)

    def per_view(best, inp):
        K, pose, f = inp
        uv, z, valid = proj.project_points(points, pose, K, (H, W))
        # Sanitize BEFORE any arithmetic: behind-camera points project to
        # inf/NaN uv; jnp.clip propagates NaN, the bilinear weights become
        # NaN, and although the forward masks them via the `valid` where,
        # the backward scatters ct*weight = 0*NaN = NaN into the image
        # feature grads — measured: this poisoned every encoder/voxel-
        # branch grad leaf and silently NaN-skipped all GSM train steps.
        u = jnp.clip(jnp.where(valid, uv[:, 0], 0.0), 0.0, W - 1.001)
        v = jnp.clip(jnp.where(valid, uv[:, 1], 0.0), 0.0, H - 1.001)
        u0, v0 = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
        du, dv = (u - u0)[:, None], (v - v0)[:, None]
        g = (f[v0, u0] * (1 - du) * (1 - dv) + f[v0, u0 + 1] * du * (1 - dv) +
             f[v0 + 1, u0] * (1 - du) * dv + f[v0 + 1, u0 + 1] * du * dv)
        # finite sentinel, not -inf: -inf==--inf max ties NaN the max VJP's
        # tie-splitting (same failure class as grid.ops scatter-max)
        g = jnp.where(valid[:, None], g, NEG)
        return jnp.maximum(best, g), None

    init = jnp.full((points.shape[0], F), NEG, feats.dtype)
    out, _ = jax.lax.scan(jax.checkpoint(per_view), init,
                          (Ks, cam_to_worlds, feats))
    return jnp.where(out > NEG / 2, out, 0.0)
