"""GSM: feed-forward 3D Gaussian scene reconstruction (pipeline stage 3).

Top-level mirror of the reference's ``gsm.Model``
(/root/reference/infinicube/voxelgen/models/gsm.py:56-507) forward
(gsm.py:90-102): voxel_preprocess -> UnifiedEncoder -> sky encode ->
DualBranch (voxel + pixel) -> sky sample -> RGBRenderer -> UnifiedLoss.

Dual-branch composition follows dual_branch.py:32-88: both branches emit flat
gaussian lists that are concatenated before rasterization. Dynamic-object
reconstruction uses ``decode_all_pixel2gs`` on the pixel branch
(inference/scene_gaussian_generation.py:580-695) — exposed here via
``pixel_gaussians(..., decode_all=True)``."""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.camera import projection as proj
from infinicube_tpu.grid.build import coarsened_grid
from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.models.gsm.encoders import (
    UnifiedEncoder, UnifiedEncoderConfig)
from infinicube_tpu.models.gsm.lifter import lift_features, visible_voxel_mask
from infinicube_tpu.models.gsm.pixel_branch import PixelBranch, PixelBranchConfig
from infinicube_tpu.models.gsm.renderer import merge_gaussians, render_views
from infinicube_tpu.models.gsm.sky import (
    SkyboxMlpModulator, SkyboxNull, SkyboxPanorama, SkyConfig)
from infinicube_tpu.models.gsm.voxel_branch import (
    VoxelBranch, VoxelBranchConfig)


@dataclasses.dataclass(frozen=True)
class GSMConfig:
    encoder: UnifiedEncoderConfig = UnifiedEncoderConfig()
    voxel: VoxelBranchConfig = VoxelBranchConfig()
    pixel: PixelBranchConfig = PixelBranchConfig()
    sky: SkyConfig = SkyConfig()
    use_voxel_branch: bool = True
    use_pixel_branch: bool = True
    grid_levels: int = 3
    dense_dims: tuple = (128, 64, 32)     # raycast crop of the scene grid
    dense_ijk_min: tuple = (-16, -32, -8)
    render_tile_capacity: int = 256
    # rasterizer tiling (measured on v5e at 3.3M gaussians: (16, 4) beats
    # (32, 2) — compositing scales with tile^2 x capacity, the sort does not
    # dominate)
    render_tile: int = 16
    render_span: int = 4
    # recompute per-view renders in backward. Off by default since the
    # rasterizer remats per tile CHUNK (ops/gsplat.py lax.map block):
    # measured at 65k voxels/3.3M gaussians/3 views 480x704, chunk-remat
    # alone = 2.85 s/step; chunk+view double remat = 6.85 s; r3's
    # view-remat-only = 3.53 s (and chunk remat is what keeps the backward
    # residuals out of HBM — the 51.5 GB no-remat OOM was the chunked
    # map's stacked [chunk, K, P] intermediates, now rematted away).
    render_remat: bool = False


def gsm_bf16_config(cfg: GSMConfig | None = None) -> GSMConfig:
    """bf16 compute in every branch (params stay f32; norms/softmax f32) —
    the TPU training configuration (image-scale convs dominate the forward;
    bf16 halves their time and memory)."""
    import dataclasses as _dc
    cfg = cfg or GSMConfig()
    return _dc.replace(
        cfg,
        voxel=_dc.replace(cfg.voxel, dtype=jnp.bfloat16),
        pixel=_dc.replace(cfg.pixel, dtype=jnp.bfloat16),
        sky=_dc.replace(cfg.sky, dtype=jnp.bfloat16))


class GSM(nn.Module):
    cfg: GSMConfig = GSMConfig()

    def setup(self):
        cfg = self.cfg
        self.encoder = UnifiedEncoder(cfg.encoder)
        if cfg.use_voxel_branch:
            self.voxel_branch = VoxelBranch(cfg.voxel)
        if cfg.use_pixel_branch:
            self.pixel_branch = PixelBranch(cfg.pixel)
        if cfg.sky.kind == "mlp_modulator":
            self.sky = SkyboxMlpModulator(cfg.sky)
        elif cfg.sky.kind == "panorama":
            self.sky = SkyboxPanorama(cfg.sky)
        else:
            self.sky = SkyboxNull()

    # -- pieces --------------------------------------------------------------
    def grid_pyramid(self, grid: Grid) -> list[Grid]:
        """voxel_preprocess's pyramid (clip/coarsen, gsm.py:473-490)."""
        grids = [grid]
        for _ in range(self.cfg.grid_levels - 1):
            grids.append(coarsened_grid(grids[-1], self.cfg.voxel.pooling_factor,
                                        capacity=grids[-1].capacity))
        return grids

    @staticmethod
    def voxel_preprocess(grid: Grid, crop_min=None, crop_max=None,
                         surface_only: bool = False,
                         coarsen=None) -> Grid:
        """Clip / coarsen / surface-keep preprocessing of the scene grid
        (reference gsm.voxel_preprocess, gsm.py:473-490). surface_only keeps
        voxels with at least one empty 6-neighbor (interior culling)."""
        import jax.numpy as jnp
        from infinicube_tpu.grid.build import grid_from_keys
        from infinicube_tpu.grid import keys as K
        from infinicube_tpu.grid.ops import neighbor_indexes
        mask = grid.mask
        if crop_min is not None:
            c = grid.voxel_centers()
            inside = jnp.all((c >= jnp.asarray(crop_min)) &
                             (c <= jnp.asarray(crop_max)), axis=-1)
            mask = mask & inside
        if surface_only:
            nbr = neighbor_indexes(grid, 3)
            # 6-connected face neighbors in the row-major 3x3x3 window
            face_taps = jnp.asarray([4, 10, 12, 14, 16, 22])
            full = jnp.all(nbr[:, :, face_taps] >= 0, axis=-1)
            mask = mask & ~full
        g = grid_from_keys(jnp.where(mask, grid.keys, K.INVALID_KEY),
                           grid.capacity, grid.voxel_size, grid.origin)
        if coarsen is not None:
            g = coarsened_grid(g, tuple(coarsen), capacity=g.capacity)
        return g

    def sky_token(self, images, sky_mask, Ks, cam_to_worlds):
        V, H, W = images.shape[:3]
        import jax
        ro_rd = jax.vmap(lambda K, p: proj.posed_rays_from_intrinsics(
            K, p, (H, W)))(Ks, cam_to_worlds)
        return self.sky.encode(images, sky_mask, ro_rd[1])

    def __call__(self, batch: dict, decode_all_pixels: bool = False):
        """batch (single scene, V input views):
          grid: Grid (batch 1), images [V,H,W,3], masks [V,H,W,4],
          Ks [V,3,3], cam_to_worlds [V,4,4],
          depth_prior [V,H,W,1] (voxel depth / provided buffer depth),
          target_Ks [Vt,3,3], target_poses [Vt,4,4] (defaults: inputs).
        Returns dict with gaussians, renders, sky token."""
        cfg = self.cfg
        images = batch["images"]
        enc = self.encoder(images[None], batch["masks"][None],
                           Ks=batch["Ks"][None],
                           cam_to_worlds=batch["cam_to_worlds"][None],
                           depth=batch.get("depth_prior",
                                           jnp.zeros(images.shape[:3] +
                                                     (1,)))[None])
        feats = enc["features"][0]                       # [V, H, W, F]
        sky_mask = enc["sky_mask"][0]
        eff_mask = enc["effective_mask"][0]
        Ks, poses = batch["Ks"], batch["cam_to_worlds"]

        sets = []
        if cfg.use_voxel_branch:
            grid = batch["grid"]
            grids = self.grid_pyramid(grid)
            lifted = lift_features(grid, feats, Ks, poses,
                                   cfg.dense_ijk_min, cfg.dense_dims)
            visible = visible_voxel_mask(grid, Ks, poses, cfg.dense_ijk_min,
                                         cfg.dense_dims,
                                         ray_hw=(images.shape[1] // 2,
                                                 images.shape[2] // 2))
            gs_v = self.voxel_branch(grids, lifted, visible, feats, Ks, poses)
            sets.append(gs_v)
        if cfg.use_pixel_branch:
            if cfg.use_voxel_branch:
                # joint inference: pixel branch handles the midground only
                # (fg-from-seg minus fg-from-grid; reference pixel_branch
                # masks "joint-infer=midground-only")
                pixel_mask = enc["midground"][0] & (eff_mask > 0)
            else:  # 2D-only mode covers all non-sky foreground
                pixel_mask = (eff_mask > 0) & ~sky_mask
            gs_p = self.pixel_branch(images, batch["depth_prior"], Ks, poses,
                                     pixel_mask=pixel_mask,
                                     decode_all=decode_all_pixels)
            sets.append(gs_p)
        gaussians = merge_gaussians(*sets)

        t_Ks = batch.get("target_Ks", Ks)
        t_poses = batch.get("target_poses", poses)
        hw = images.shape[1:3]
        import jax
        t_dirs = jax.vmap(lambda K, p: proj.posed_rays_from_intrinsics(
            K, p, hw)[1])(t_Ks, t_poses)                 # [Vt, H, W, 3]
        if cfg.sky.kind == "mlp_modulator":
            token = self.sky_token(images, sky_mask, Ks, poses)
            sky_images = self.sky.sample(token, t_dirs)
        else:
            token = None
            sky_images = self.sky(t_dirs)

        render = render_views(gaussians, t_Ks, t_poses, hw,
                              sky_images=sky_images,
                              tile_capacity=cfg.render_tile_capacity,
                              tile=cfg.render_tile,
                              max_span=cfg.render_span,
                              remat=cfg.render_remat)
        return {"gaussians": gaussians, "render": render,
                "sky_token": token, "sky_mask": sky_mask,
                "effective_mask": eff_mask}


# -- jitted inference entry points --------------------------------------------
# An UNJITTED flax apply executes op-by-op; on an RPC-attached accelerator
# every one of the model's thousands of primitive dispatches pays tunnel
# latency (measured: the e2e stage-3 "steady" pass spent ~90 s in eager
# apply + a repeated eager init at a scene whose jitted forward is ~1 s).
# Module-scope jits so the compile cache persists across calls; `model` is a
# static argument — flax modules hash by config, so fresh GSM(cfg) instances
# with equal configs HIT the cache (the vae3d._TILE_JIT_CACHE lesson).

@functools.partial(jax.jit, static_argnums=(0, 3))
def gsm_apply_jit(model: GSM, params, batch: dict,
                  decode_all_pixels: bool = False):
    return model.apply(params, batch, decode_all_pixels=decode_all_pixels)


@functools.partial(jax.jit, static_argnums=(0,))
def gsm_init_jit(model: GSM, rng, batch: dict):
    return model.init(rng, batch)
