"""SDEdit-style latent overlap consistency for chunked world extrapolation.

Equivalent of the reference's ``sdedit_prepare_input``
(/root/reference/infinicube/voxelgen/modules/diffusionmodules/sdedit.py:21-95):
latents of the previous chunk are rigidly transformed into the current chunk's
latent cube; at every sampler step the overlapping cube entries are overwritten
with the previous latents re-noised to the current timestep, so the overlap
region denoises toward the already-generated content.

Dense-cube formulation: the prev->current warp is resampled once (nearest
neighbor, matching the reference's discrete latent overwrite) into
``(warped_latents, overlap_mask)``; the per-step overwrite is a
``step_callback`` for the samplers in schedulers.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from infinicube_tpu.camera.conventions import invert_pose
from infinicube_tpu.models.diffusion.schedulers import NoiseSchedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDEditState:
    warped_latents: jnp.ndarray  # f32[B, D, H, W, C]
    overlap_mask: jnp.ndarray    # bool[B, D, H, W]


def warp_prev_latents(prev_latents: jnp.ndarray, prev_valid: jnp.ndarray,
                      rel_transform: jnp.ndarray, ijk_min, voxel_size,
                      origin) -> SDEditState:
    """Resample previous-chunk latents into the current chunk's cube.

    prev_latents f32[B, D, H, W, C] (previous chunk cube); prev_valid
    bool[B, D, H, W] (which prev entries hold generated content);
    rel_transform f32[4, 4] mapping CURRENT chunk frame -> PREVIOUS chunk
    frame (the reference's ``spatial_movement``).
    """
    B, D, H, W, C = prev_latents.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W),
                              indexing="ij")
    ijk = jnp.stack([ii, jj, kk], -1).astype(jnp.float32) + \
        jnp.asarray(ijk_min, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    org = jnp.asarray(origin, jnp.float32)
    cur_world = ijk * vs + org
    prev_world = cur_world @ rel_transform[:3, :3].T + rel_transform[:3, 3]
    prev_ijk = jnp.round((prev_world - org) / vs).astype(jnp.int32) - \
        jnp.asarray(ijk_min, jnp.int32)
    ok = jnp.all((prev_ijk >= 0) & (prev_ijk < jnp.array([D, H, W])), axis=-1)
    pi = jnp.clip(prev_ijk[..., 0], 0, D - 1)
    pj = jnp.clip(prev_ijk[..., 1], 0, H - 1)
    pk = jnp.clip(prev_ijk[..., 2], 0, W - 1)
    warped = prev_latents[:, pi, pj, pk, :]
    mask = ok[None] & prev_valid[:, pi, pj, pk]
    return SDEditState(warped_latents=jnp.where(mask[..., None], warped, 0.0),
                       overlap_mask=mask)


def make_sdedit_callback(state: SDEditState, schedule: NoiseSchedule,
                         rng: jax.Array):
    """step_callback(x, t, i) for the samplers: overwrite overlap entries with
    the prev latents re-noised to timestep t."""
    def callback(x, t, i):
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape)
        a = schedule.alphas_cumprod[t]
        noised = jnp.sqrt(a) * state.warped_latents + jnp.sqrt(1 - a) * noise
        return jnp.where(state.overlap_mask[..., None], noised, x)
    return callback
