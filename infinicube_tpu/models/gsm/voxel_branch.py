"""GSM voxel branch: guided sparse UNet over the scene grid -> K gaussians
per voxel.

Mirror of the reference's Pure3DUnet
(/root/reference/infinicube/voxelgen/modules/gsm_modules/backbone/
voxel_branch.py:331-1075): lifted image features run through a sparse UNet
whose structure is *guided* (the grid pyramid is known — no structure
prediction, voxel_branch decode 704-739); voxels are split into camera-visible
and occluded sets (occ-front raycast); visible voxels get a hybrid head that
also max-pools projected multi-view 2D features; every voxel decodes K
gaussians (relative position bounded by gs_free_space x voxel size, exp scale
clamped, normalized quat, sigmoid opacity/rgb — feature2gs 883-908)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.build import subdivided_grid
from infinicube_tpu.grid.ops import max_pool, neighbor_indexes, upsample_nearest
from infinicube_tpu.nn.sparse import SparseResBlock, conv_plan
from infinicube_tpu.models.gsm.lifter import sample_image_features


@dataclasses.dataclass(frozen=True)
class VoxelBranchConfig:
    f_maps: int = 64
    levels: int = 3
    pooling_factor: tuple = (2, 2, 2)
    gaussians_per_voxel: int = 4       # release gsplat_upsample=4
    gs_free_space: float = 1.5         # offset bound in voxel units
    max_scaling: float = 12.0          # scale clamp (x voxel size)
    vis_subdiv: int = 2                # occ_upsample factor (ref :359)
    vis_subdiv_capacity_mult: int = 4  # subdivided-grid capacity / base
    conv_backend: str = "auto"
    # Optional (ijk_min, dims) cube covering the LEVEL-0 scene grid: turns
    # the conv-plan builds into dense slot-volume lookups (one
    # scatter+gather instead of the 27-tap searchsorted — see
    # nn.sparse.conv_plan). Opt-in because GSM also runs on world-scale
    # grids (inference merges) where no static cube exists; training on
    # per-sample crops sets it (configs/train_gsm.yaml, bench_gsm_train).
    # Out-of-cube voxels NaN-poison via plan.overflowed — loud, not wrong.
    dense_lookup_bounds: tuple | None = None
    dtype: Any = jnp.float32

    def level_dense_bounds(self, level: int):
        """Level-`level` cube: level-0 bounds through the floor-div
        coarsening by pooling_factor (same derivation as
        SparseVAEConfig.level_dense_bounds)."""
        if self.dense_lookup_bounds is None:
            return None
        import numpy as np
        mn0, dm0 = self.dense_lookup_bounds
        mn = np.asarray(mn0, np.int64)
        mx = mn + np.asarray(dm0, np.int64) - 1
        f = np.asarray(self.pooling_factor, np.int64)
        for _ in range(level):
            mn = np.floor_divide(mn, f)
            mx = np.floor_divide(mx, f)
        return (tuple(int(v) for v in mn),
                tuple(int(v) for v in (mx - mn + 1)))


class GaussianHead(nn.Module):
    """features -> K gaussians per voxel: (dpos 3, scale 3, quat 4, op 1,
    rgb 3) x K."""
    cfg: VoxelBranchConfig
    name_prefix: str = "head"

    @nn.compact
    def __call__(self, feats, grid: Grid, mask):
        cfg = self.cfg
        K = cfg.gaussians_per_voxel
        out = nn.Dense(K * 14, name=f"{self.name_prefix}_out")(feats)
        B, C = feats.shape[:2]
        out = out.reshape(B, C, K, 14)
        centers = grid.voxel_centers()[:, :, None, :]
        vs = grid.voxel_size
        dpos = jnp.tanh(out[..., 0:3]) * cfg.gs_free_space * vs
        means = centers + dpos
        scales = jnp.exp(jnp.clip(out[..., 3:6], -10.0, 2.5)) * \
            jnp.minimum(vs * cfg.max_scaling, vs * jnp.exp(2.5))
        quats = out[..., 6:10] + jnp.array([1.0, 0, 0, 0])
        quats = quats / jnp.maximum(
            jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-6)
        opacity = nn.sigmoid(out[..., 10])
        rgb = nn.sigmoid(out[..., 11:14])
        valid = jnp.broadcast_to(mask[:, :, None], (B, C, K))
        return {"means": means, "scales": scales, "quats": quats,
                "opacities": jnp.where(valid, opacity, 0.0), "colors": rgb,
                "valid": valid}


class VoxelBranch(nn.Module):
    cfg: VoxelBranchConfig = VoxelBranchConfig()

    @nn.compact
    def __call__(self, grids: list[Grid], feats: jnp.ndarray,
                 visible: jnp.ndarray, image_feats: jnp.ndarray,
                 Ks: jnp.ndarray, cam_to_worlds: jnp.ndarray):
        """grids: guided pyramid [G0 (scene grid) .. G_L]; feats [B, C0, F]
        lifted features on G0; visible bool[B, C0]; image_feats [V, H, W, Fi]
        (batch-1 assumption for multi-view sampling, as in the reference's
        per-scene inference)."""
        cfg = self.cfg
        L = min(cfg.levels, len(grids))
        h = nn.Dense(cfg.f_maps, name="in_proj")(feats)
        skips = []
        # encoder (guided pooling down the pyramid)
        for l in range(L):
            nbr = conv_plan(grids[l], self.cfg.conv_backend,
                            dense_bounds=cfg.level_dense_bounds(l))
            h = SparseResBlock(cfg.f_maps * 2 ** l, dtype=cfg.dtype,
                               name=f"enc{l}")(h, nbr, grids[l].mask)
            skips.append(h)
            if l < L - 1:
                _, h = max_pool(grids[l], h, cfg.pooling_factor,
                                coarse=grids[l + 1])
        # decoder (guided upsample: the fine grid is known)
        for l in range(L - 2, -1, -1):
            _, h = upsample_nearest(grids[l + 1], h, cfg.pooling_factor,
                                    fine=grids[l])
            h = jnp.concatenate([h, skips[l]], axis=-1)
            nbr = conv_plan(grids[l], self.cfg.conv_backend,
                            dense_bounds=cfg.level_dense_bounds(l))
            h = SparseResBlock(cfg.f_maps * 2 ** l, dtype=cfg.dtype,
                               name=f"dec{l}")(h, nbr, grids[l].mask)

        g0 = grids[0]
        # visible (occ-front) voxels are SUBDIVIDED x2 before the hybrid
        # head (reference occ_upsample = UpsamplingNearest(2),
        # voxel_branch.py:806-848): children inherit parent features, then
        # each child center samples multi-view 2D features (max-pooled over
        # visible views) which are CONCATENATED with the 3D features
        sub = subdivided_grid(g0, cfg.vis_subdiv,
                              submask=visible & g0.mask,
                              capacity=g0.capacity *
                              cfg.vis_subdiv_capacity_mult)
        _, h_sub = upsample_nearest(g0, h, cfg.vis_subdiv, fine=sub)
        pts = sub.voxel_centers()[0]
        mv = sample_image_features(pts, image_feats, Ks, cam_to_worlds)[None]
        mv = jnp.where(sub.mask[..., None], mv, 0.0)
        h_hybrid = jnp.concatenate([mv, h_sub], axis=-1)

        gs_vis = GaussianHead(cfg, "vis", name="head_vis")(
            h_hybrid, sub, sub.mask)
        # occluded voxels stay at base resolution with 3D features only
        # (reference up_sample0 = UpsamplingNearest(1) + render_head)
        gs_occ = GaussianHead(cfg, "occ", name="head_occ")(
            h, g0, g0.mask & ~visible)
        # merge the two sets (disjoint validity)
        merged = {k: jnp.concatenate([gs_vis[k], gs_occ[k]], axis=1)
                  for k in gs_vis}
        return merged
