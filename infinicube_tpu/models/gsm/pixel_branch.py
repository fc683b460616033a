"""GSM pixel branch: 2D UNet over RGB + depth priors -> K gaussians per pixel.

Mirror of the reference's Pure2DUNet
(/root/reference/infinicube/voxelgen/modules/gsm_modules/backbone/
pixel_branch.py:41-328): an XUnet-style 2D UNet consumes RGB concatenated
with depth priors (voxel depth at train, provided buffer depth at inference,
patch-dropout supported); each pixel decodes K=2 gaussians placed ALONG ITS
RAY at depth = znear + sigmoid(d) * (zfar - znear) (interpret_output_depth
'weight', 242-328). ``decode_all_pixel2gs`` (212-228) disables masking for
dynamic-object reconstruction."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.camera import projection as proj


@dataclasses.dataclass(frozen=True)
class PixelBranchConfig:
    width: int = 32
    dims: tuple = (1, 2, 4, 8)          # release XUnet dims
    gs_per_pixel: int = 2
    znear: float = 0.3
    zfar: float = 200.0
    max_scale: float = 0.4              # world units
    depth_dropout: float = 0.5          # masked_voxel_depth patch dropout
    dtype: Any = jnp.float32


class UNet2D(nn.Module):
    cfg: PixelBranchConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        w = cfg.width
        h = nn.Conv(w, (3, 3), dtype=cfg.dtype, name="stem")(x)
        skips = []
        for i, m in enumerate(cfg.dims):
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h))
            h = nn.Conv(w * m, (3, 3), dtype=cfg.dtype, name=f"d{i}")(h)
            skips.append(h)
            if i < len(cfg.dims) - 1:
                h = nn.Conv(w * m, (3, 3), strides=(2, 2), dtype=cfg.dtype,
                            name=f"down{i}")(h)
        for i in range(len(cfg.dims) - 2, -1, -1):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h))
            h = nn.Conv(w * cfg.dims[i], (3, 3), dtype=cfg.dtype,
                        name=f"u{i}")(h)
        return h


class PixelBranch(nn.Module):
    cfg: PixelBranchConfig = PixelBranchConfig()

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, depth_prior: jnp.ndarray,
                 Ks: jnp.ndarray, cam_to_worlds: jnp.ndarray,
                 pixel_mask: jnp.ndarray | None = None,
                 decode_all: bool = False):
        """rgb f32[V, H, W, 3]; depth_prior f32[V, H, W, 1] (0 = unknown);
        pixel_mask bool[V, H, W] selects which pixels emit gaussians (the
        midground mask; ignored when decode_all=True). Returns flat gaussian
        dict (means [M,3], ... valid [M]) with M = V*H*W*K."""
        cfg = self.cfg
        V, H, W, _ = rgb.shape
        x = jnp.concatenate([rgb, depth_prior,
                             (depth_prior > 0).astype(jnp.float32)], axis=-1)
        feats = UNet2D(cfg, name="unet")(x)
        K = cfg.gs_per_pixel
        out = nn.Dense(K * 13, name="head")(feats).reshape(V, H, W, K, 13)

        def rays(Km, pose):
            return proj.posed_rays_from_intrinsics(Km, pose, (H, W),
                                                   normalize=False)
        ro, rd = jax.vmap(rays)(Ks, cam_to_worlds)         # [V, H, W, 3]

        s = nn.sigmoid(out[..., 0])                        # depth in [0,1]
        depth = cfg.znear + s * (cfg.zfar - cfg.znear)     # [V, H, W, K]
        # blend toward the provided prior where present (provided_depth mode)
        has_prior = (depth_prior[..., 0] > 0)[..., None]
        prior = depth_prior[..., :1]
        gate = nn.sigmoid(out[..., 1])
        depth = jnp.where(has_prior, prior * (1 - 0.25 * (gate - 0.5)), depth)
        means = ro[:, :, :, None, :] + rd[:, :, :, None, :] * depth[..., None]
        scales = jnp.exp(jnp.clip(out[..., 2:5], -10.0, 0.0)) * cfg.max_scale \
            * (depth[..., None] / 10.0 + 0.1)
        quats = out[..., 5:9] + jnp.array([1.0, 0, 0, 0])
        quats = quats / jnp.maximum(
            jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-6)
        opacity = nn.sigmoid(out[..., 9])
        # rgb = input pixel color + bounded residual
        colors = jnp.clip(rgb[:, :, :, None, :] +
                          (nn.sigmoid(out[..., 10:13]) - 0.5), 0.0, 1.0)
        if decode_all or pixel_mask is None:
            valid = jnp.ones((V, H, W, K), bool)
        else:
            valid = jnp.broadcast_to(pixel_mask[..., None], (V, H, W, K))

        flat = lambda a: a.reshape((-1,) + a.shape[4:])
        return {"means": flat(means), "scales": flat(scales),
                "quats": flat(quats),
                "opacities": jnp.where(valid, opacity, 0.0).reshape(-1),
                "colors": flat(colors), "valid": valid.reshape(-1),
                "depth": depth}
