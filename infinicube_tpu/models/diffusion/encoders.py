"""Condition encoders for the voxel latent diffusion model.

TPU-native equivalents of the reference's conditioning stack
(/root/reference/infinicube/voxelgen/modules/encoders/map_encoder.py:51-171,
box3d_encoder.py:48-193, diffusion.py:468-473 pos-embed):

- MapEncoder: HD-map polyline points (road_edge / road_line / road_surface)
  rasterized into a per-type occupancy cube over the dense latent grid via a
  single scatter (reference: ijk rasterize + torch scatter_sum).
- Box3dEncoder: 3D boxes stamped into (sin heading, cos heading) channels for
  every latent voxel inside the box. The reference computes exact pytorch3d
  box3d_overlap IoU and keeps voxels with >=50% volume intersection
  (SURVEY.md §7.4); the TPU build tests the voxel *center* against the
  oriented box, which matches the >=50%-volume rule up to boundary voxels and
  is a pure gather/compare op.
- pos_embed: normalized latent-cube coordinates, 3 channels.

All encoders output dense NDHWC cubes ready to concat with the latent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from infinicube_tpu.utils.bbox import points_in_obb


def latent_cube_centers(cube_dims, ijk_min, voxel_size, origin) -> jnp.ndarray:
    """f32[D, H, W, 3] world centers of the dense latent cube voxels.
    The cube spans ijk in [ijk_min, ijk_min + dims) (release: x/y centered,
    z shifted — ijk_min (-32, -32, -16) for the 51.2x51.2x25.6 m crop)."""
    D, H, W = cube_dims
    ii, jj, kk = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W),
                              indexing="ij")
    ijk = jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) + \
        jnp.asarray(ijk_min, jnp.float32)
    return ijk * jnp.asarray(voxel_size) + jnp.asarray(origin)


def pos_embed_cube(cube_dims) -> jnp.ndarray:
    """f32[D, H, W, 3] normalized coordinates in [-1, 1] (the release's
    use_pos_embed concat channels, diffusion.py:244,468)."""
    D, H, W = cube_dims
    ii, jj, kk = jnp.meshgrid(jnp.linspace(-1, 1, D), jnp.linspace(-1, 1, H),
                              jnp.linspace(-1, 1, W), indexing="ij")
    return jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32)


def encode_map(map_points: jnp.ndarray, map_mask: jnp.ndarray,
               cube_dims, ijk_min, voxel_size, origin) -> jnp.ndarray:
    """Rasterize map polyline points into per-type occupancy cubes.

    map_points f32[B, T, N, 3] world (crop frame), map_mask bool[B, T, N],
    T = number of map types (release: road_edge, road_line, road_surface).
    Returns f32[B, D, H, W, T] in {0, 1}.
    """
    D, H, W = cube_dims
    B, T, N, _ = map_points.shape
    vs = jnp.asarray(voxel_size, jnp.float32)
    org = jnp.asarray(origin, jnp.float32)
    ijk = jnp.round((map_points - org) / vs).astype(jnp.int32) - \
        jnp.asarray(ijk_min, jnp.int32)
    ok = map_mask & jnp.all((ijk >= 0) & (ijk < jnp.array([D, H, W])), axis=-1)
    flat = (ijk[..., 0] * H + ijk[..., 1]) * W + ijk[..., 2]
    flat = jnp.where(ok, flat, D * H * W)

    def per_bt(f):
        occ = jnp.zeros((D * H * W,), jnp.float32)
        return occ.at[f].add(1.0, mode="drop")

    occ = jax.vmap(jax.vmap(per_bt))(flat)            # [B, T, DHW]
    occ = jnp.minimum(occ, 1.0)
    return occ.reshape(B, T, D, H, W).transpose(0, 2, 3, 4, 1)


def encode_boxes(box_poses: jnp.ndarray, box_lwhs: jnp.ndarray,
                 box_mask: jnp.ndarray, cube_dims, ijk_min, voxel_size, origin,
                 add_occupancy_flag: bool = False) -> jnp.ndarray:
    """Stamp oriented boxes into (sin, cos[, occ]) heading cubes.

    box_poses f32[B, M, 4, 4] object-to-crop-world; box_lwhs f32[B, M, 3];
    box_mask bool[B, M]. Heading = box +x axis yaw. Later boxes overwrite
    earlier on overlap (matches reference loop order).
    Returns f32[B, D, H, W, 2 or 3].
    """
    D, H, W = cube_dims
    centers = latent_cube_centers(cube_dims, ijk_min, voxel_size,
                                  origin).reshape(-1, 3)
    C = 3 if add_occupancy_flag else 2

    def per_sample(poses, lwhs, mask):
        def body(carry, inp):
            pose, lwh, ok = inp
            inside = points_in_obb(centers, pose, lwh) & ok
            yaw = jnp.arctan2(pose[1, 0], pose[0, 0])
            enc = jnp.stack([jnp.sin(yaw), jnp.cos(yaw)] +
                            ([jnp.array(1.0)] if add_occupancy_flag else []))
            return jnp.where(inside[:, None], enc, carry), None

        init = jnp.zeros((centers.shape[0], C))
        out, _ = jax.lax.scan(body, init, (poses, lwhs, mask))
        return out.reshape(D, H, W, C)

    return jax.vmap(per_sample)(box_poses, box_lwhs, box_mask)


def classifier_free_drop(cond: jnp.ndarray, rng: jax.Array, prob: float):
    """Zero the condition per sample with probability ``prob`` (training-time
    classifier-free guidance dropout, reference diffusion.py:476-498)."""
    B = cond.shape[0]
    drop = jax.random.uniform(rng, (B,)) < prob
    return jnp.where(drop.reshape((-1,) + (1,) * (cond.ndim - 1)),
                     jnp.zeros_like(cond), cond)
