"""Unbounded voxel-world generation: chunked diffusion with SDEdit overlap.

Mirror of the reference's ``VoxelWorldGenerator``
(/root/reference/infinicube/inference/voxel_world_generation.py:200-925):

- **trajectory mode** (796-855): key poses every ``pose_interval_ratio x
  chunk extent`` meters along the (optionally extrapolated) ego trajectory;
  per chunk, map/box conditions are warped into the chunk frame, a dense
  latent cube is sampled (DDIM + CFG, EMA params) with the previous chunk's
  latents re-noised into the overlap (SDEdit, sdedit.py:21-95), decoded by
  the VAE structure decoder, and the resulting semantic grid is warped into
  the world frame and merged (merge_grid2_to_grid1 semantics: existing
  voxels win).
- **blocks mode** (857-925): the map extent is tiled with ``overlap_ratio``;
  empty tiles are skipped; a **latent ijk hash table** caches every
  generated latent at its world latent coordinate so any overlapping region
  of later blocks is SDEdit-consistent (665-785).

The sampler+decoder run as jitted device programs; chunk scheduling, warps
and the world accumulation are host-side (NumPy / WorldGrid)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)
from infinicube_tpu.models.diffusion.sdedit import SDEditState
from infinicube_tpu.utils.world_grid import WorldGrid, transform_ijk


@dataclasses.dataclass(frozen=True)
class WorldGenConfig:
    pose_interval_ratio: float = 0.75   # chunk spacing (x chunk extent)
    block_overlap_ratio: float = 0.25
    ddim_steps: int = 100
    guidance_scale: float = 1.0
    scale_factor: float = 1.0
    max_map_points: int = 8192
    max_boxes: int = 32
    extrapolation_steps: int = 0        # chunks beyond the data trajectory
    cc_min_size: int = 0                # optional connected-component filter


class VoxelWorldGenerator:
    """decode_fn(latents [1,D,H,W,C]) -> (ijk np[M,3], semantics np[M])
    in CHUNK frame voxel coords at the finest voxel size."""

    def __init__(self, diffusion: VoxelDiffusion, params,
                 decode_fn: Callable, cfg: WorldGenConfig = WorldGenConfig(),
                 finest_voxel_size=0.2):
        self.diffusion = diffusion
        self.params = params
        self.decode_fn = decode_fn
        self.cfg = cfg
        self.vs = np.broadcast_to(np.asarray(finest_voxel_size, np.float64),
                                  (3,)).copy()
        dc: DiffusionConfig = diffusion.cfg
        self.chunk_extent = (np.asarray(dc.cube_dims) *
                             np.asarray(dc.latent_voxel_size))
        # world latent bookkeeping for blocks mode: the reference's
        # latent_ijk_hash_table (voxel_world_generation.py:665-785) as a
        # SORTED packed-int64-key array + row-aligned value matrix — all
        # lookups/inserts are vectorized numpy (a per-cell Python dict costs
        # ~1 s per 262k-cell release block on one host core)
        self._table_keys = np.empty((0,), np.int64)
        self._table_vals = np.empty((0, diffusion.cfg.latent_channels),
                                    np.float32)

    # ------------------------------------------------------------ condition
    def _cond_for_chunk(self, world_to_chunk: np.ndarray,
                        map_points: dict[str, np.ndarray] | None,
                        boxes: dict | None) -> CondCubes:
        dc = self.diffusion.cfg
        T = dc.num_map_types
        N = self.cfg.max_map_points
        mp = np.zeros((1, T, N, 3), np.float32)
        mm = np.zeros((1, T, N), bool)
        if map_points:
            for ti, (_, pts) in enumerate(sorted(map_points.items())):
                if ti >= T or pts is None or len(pts) == 0:
                    continue
                w = np.asarray(pts, np.float64)
                c = w @ world_to_chunk[:3, :3].T + world_to_chunk[:3, 3]
                n = min(len(c), N)
                sel = np.linspace(0, len(c) - 1, n).astype(int)
                mp[0, ti, :n] = c[sel]
                mm[0, ti, :n] = True
        M = self.cfg.max_boxes
        bp = np.tile(np.eye(4, dtype=np.float32), (1, M, 1, 1))
        bl = np.ones((1, M, 3), np.float32)
        bm = np.zeros((1, M), bool)
        if boxes and len(boxes.get("poses", [])) > 0:
            poses = np.asarray(boxes["poses"], np.float64)[:M]
            lwhs = np.asarray(boxes["lwhs"], np.float32)[:M]
            n = len(poses)
            bp[0, :n] = (world_to_chunk @ poses).astype(np.float32)
            bl[0, :n] = lwhs
            bm[0, :n] = True
        return self.diffusion.encode_conditions(
            jnp.asarray(mp), jnp.asarray(mm), jnp.asarray(bp),
            jnp.asarray(bl), jnp.asarray(bm))

    # --------------------------------------------------------------- sample
    def _sample_chunk(self, cond: CondCubes, rng,
                      sdedit: SDEditState | None) -> np.ndarray:
        lat = self.diffusion.sample(
            self.params, rng, cond, num_steps=self.cfg.ddim_steps,
            guidance_scale=self.cfg.guidance_scale,
            scale_factor=self.cfg.scale_factor,
            sdedit=sdedit, use_sdedit=sdedit is not None)
        return np.asarray(jax.device_get(lat))

    def _decode_and_merge(self, latents: np.ndarray, chunk_to_world: np.ndarray,
                          world: WorldGrid):
        ijk, semantics = self.decode_fn(jnp.asarray(latents))
        ijk = np.asarray(ijk)
        semantics = np.asarray(semantics)
        if self.cfg.cc_min_size > 1 and len(ijk):
            from infinicube_tpu.utils.world_grid import (
                connected_component_filter)
            keep = connected_component_filter(ijk.astype(np.int64),
                                              self.cfg.cc_min_size)
            ijk, semantics = ijk[keep], semantics[keep]
        wijk = transform_ijk(ijk.astype(np.int64), chunk_to_world,
                             world.voxel_size, world.origin)
        world.merge_ijk(wijk, semantics, keep_existing=True)

    # ---------------------------------------------------- SDEdit bookkeeping
    def _sdedit_from_prev(self, prev_latents: np.ndarray,
                          cur_to_prev: np.ndarray) -> SDEditState:
        from infinicube_tpu.models.diffusion.sdedit import warp_prev_latents
        dc = self.diffusion.cfg
        valid = jnp.ones(prev_latents.shape[:4], bool)
        return warp_prev_latents(jnp.asarray(prev_latents), valid,
                                 jnp.asarray(cur_to_prev, jnp.float32),
                                 dc.cube_ijk_min, dc.latent_voxel_size,
                                 dc.latent_origin)

    # -------------------------------------------------------------- publics
    def key_poses_along_trajectory(self, ego_poses: np.ndarray) -> np.ndarray:
        """Resample FLU ego poses to chunk key poses every interval meters
        (+ optional extrapolation along the last heading)."""
        from infinicube_tpu.utils.interpolate import extrapolate_trajectory
        interval = float(self.chunk_extent[0]) * self.cfg.pose_interval_ratio
        pts = ego_poses[:, :3, 3]
        d = np.concatenate([[0], np.cumsum(
            np.linalg.norm(np.diff(pts, axis=0), axis=-1))])
        keys = [ego_poses[0]]
        next_d = interval
        for i in range(1, len(ego_poses)):
            if d[i] >= next_d:
                keys.append(ego_poses[i])
                next_d += interval
        keys = np.asarray(keys)
        if self.cfg.extrapolation_steps:
            keys = extrapolate_trajectory(keys, self.cfg.extrapolation_steps,
                                          interval)
        return keys

    def generate_trajectory(self, ego_poses: np.ndarray,
                            map_points: dict[str, np.ndarray] | None = None,
                            boxes: dict | None = None, seed: int = 0,
                            world: WorldGrid | None = None) -> WorldGrid:
        """ego_poses f64[T, 4, 4] FLU world. Returns the accumulated world."""
        world = world or WorldGrid(self.vs)
        keys = self.key_poses_along_trajectory(np.asarray(ego_poses))
        rng = jax.random.PRNGKey(seed)
        prev_latents, prev_pose = None, None
        for step, pose in enumerate(keys):
            w2c = np.linalg.inv(pose)
            cond = self._cond_for_chunk(w2c, map_points, boxes)
            sdedit = None
            if prev_latents is not None:
                cur_to_prev = np.linalg.inv(prev_pose) @ pose
                sdedit = self._sdedit_from_prev(prev_latents, cur_to_prev)
            rng, sub = jax.random.split(rng)
            latents = self._sample_chunk(cond, sub, sdedit)
            self._decode_and_merge(latents, pose, world)
            prev_latents, prev_pose = latents, pose
        return world

    # blocks mode -------------------------------------------------------------
    def _block_centers(self, bbox_min, bbox_max) -> np.ndarray:
        ext = self.chunk_extent[:2]
        step = ext * (1.0 - self.cfg.block_overlap_ratio)
        xs = np.arange(bbox_min[0] + ext[0] / 2, bbox_max[0] + step[0] / 2,
                       step[0])
        ys = np.arange(bbox_min[1] + ext[1] / 2, bbox_max[1] + step[1] / 2,
                       step[1])
        cx, cy = np.meshgrid(xs, ys, indexing="ij")
        return np.stack([cx.ravel(), cy.ravel(), np.zeros(cx.size)], -1)

    def _latent_world_ijk(self, chunk_to_world: np.ndarray) -> np.ndarray:
        """World-space latent coordinates of the chunk's cube cells
        (integer for axis-aligned translated blocks)."""
        dc = self.diffusion.cfg
        D, H, W = dc.cube_dims
        ii, jj, kk = np.meshgrid(*[np.arange(n) for n in (D, H, W)],
                                 indexing="ij")
        ijk = np.stack([ii, jj, kk], -1).reshape(-1, 3) + \
            np.asarray(dc.cube_ijk_min)
        lvs = np.asarray(dc.latent_voxel_size)
        lorg = np.asarray(dc.latent_origin)
        world = (ijk * lvs + lorg) @ np.asarray(chunk_to_world)[:3, :3].T + \
            chunk_to_world[:3, 3]
        return np.round((world - lorg) / lvs).astype(np.int64)

    @staticmethod
    def _pack_keys(wijk: np.ndarray) -> np.ndarray:
        """World latent ijk -> packed int64 (21 bits/axis, offset-biased:
        ±2^20 latent cells ≈ ±800 km at the 0.8 m release latent pitch)."""
        b = wijk.astype(np.int64) + (1 << 20)
        if not ((b >= 0) & (b < (1 << 21))).all():
            # explicit (not assert: stripped under -O) — out-of-range ijk
            # would silently alias into neighboring axes' bit fields
            raise ValueError("latent ijk outside the +-2^20 table domain")
        return (b[:, 0] << 42) | (b[:, 1] << 21) | b[:, 2]

    def _sdedit_from_table(self, chunk_to_world: np.ndarray):
        dc = self.diffusion.cfg
        D, H, W = dc.cube_dims
        if len(self._table_keys) == 0:
            return None
        keys = self._pack_keys(self._latent_world_ijk(chunk_to_world))
        lat = np.zeros((D * H * W, dc.latent_channels), np.float32)
        pos = np.searchsorted(self._table_keys, keys)
        pos_c = np.minimum(pos, len(self._table_keys) - 1)
        mask = (self._table_keys[pos_c] == keys) & \
            (pos < len(self._table_keys))
        if not mask.any():
            return None
        lat[mask] = self._table_vals[pos_c[mask]]
        return SDEditState(
            warped_latents=jnp.asarray(lat.reshape(1, D, H, W, -1)),
            overlap_mask=jnp.asarray(mask.reshape(1, D, H, W)))

    def _update_table(self, latents: np.ndarray, chunk_to_world: np.ndarray):
        keys = self._pack_keys(self._latent_world_ijk(chunk_to_world))
        flat = np.asarray(latents, np.float32).reshape(-1, latents.shape[-1])
        # a rotated chunk_to_world can round two latent cells onto one world
        # cell; dedupe within the update so the table keeps its unique-cells
        # invariant (first row wins, matching the old dict semantics)
        _, first = np.unique(keys, return_index=True)
        if len(first) != len(keys):
            keys, flat = keys[first], flat[first]
        if len(self._table_keys) == 0:
            fresh = np.ones(len(keys), bool)
        else:
            pos = np.searchsorted(self._table_keys, keys)
            pos_c = np.minimum(pos, len(self._table_keys) - 1)
            fresh = ~((self._table_keys[pos_c] == keys) &
                      (pos < len(self._table_keys)))
        # existing entries win (reference table semantics: the first block
        # to generate a world cell owns its latent)
        all_k = np.concatenate([self._table_keys, keys[fresh]])
        all_v = np.concatenate([self._table_vals, flat[fresh]])
        order = np.argsort(all_k, kind="stable")
        self._table_keys = all_k[order]
        self._table_vals = all_v[order]

    @property
    def _latent_table(self) -> dict:
        """Dict view of the packed table (tests/back-compat; small worlds)."""
        return {tuple(((int(k) >> s) & ((1 << 21) - 1)) - (1 << 20)
                      for s in (42, 21, 0)): v
                for k, v in zip(self._table_keys, self._table_vals)}

    def generate_blocks(self, bbox_min, bbox_max,
                        map_points: dict[str, np.ndarray] | None = None,
                        boxes: dict | None = None, seed: int = 0,
                        skip_empty_fn: Callable | None = None,
                        world: WorldGrid | None = None) -> WorldGrid:
        """Tile [bbox_min, bbox_max] (world xy) with overlapping blocks.
        skip_empty_fn(center) -> bool skips blocks with no map content
        (reference 599-632 skip-empty)."""
        world = world or WorldGrid(self.vs)
        rng = jax.random.PRNGKey(seed)
        for center in self._block_centers(bbox_min, bbox_max):
            if skip_empty_fn is not None and skip_empty_fn(center):
                continue
            c2w = np.eye(4)
            c2w[:3, 3] = center
            cond = self._cond_for_chunk(np.linalg.inv(c2w), map_points, boxes)
            sdedit = self._sdedit_from_table(c2w)
            rng, sub = jax.random.split(rng)
            latents = self._sample_chunk(cond, sub, sdedit)
            self._update_table(latents, c2w)
            self._decode_and_merge(latents, c2w, world)
        return world


def vae_decode_fn(vae, vae_params, batch_idx: int = 0) -> Callable:
    """Standard decode_fn: VAE structure decoder -> (ijk, semantics) of the
    finest decoded grid (reference evaluation_api's decode, diffusion.py:1536).

    The decode apply is jitted (static model, module-scope cache): it runs
    once per chunk/block of a world generation — eager per-op dispatch
    through an RPC-attached accelerator costs seconds per call."""
    def fn(latents):
        dec = _vae_decode_jit(vae, vae_params, latents)
        grid = dec["grid"]
        mask = np.asarray(grid.mask[batch_idx])
        ijk = np.asarray(grid.ijk[batch_idx])[mask]
        sem = np.asarray(jnp.argmax(dec["semantic_logits"][batch_idx], -1)
                         )[mask]
        return ijk, sem
    return fn


@functools.partial(jax.jit, static_argnums=(0,))
def _vae_decode_jit(vae, vae_params, latents):
    from infinicube_tpu.models.vae.sunet import SparseStructureVAE
    return vae.apply(vae_params, latents, None,
                     method=SparseStructureVAE.decode)
