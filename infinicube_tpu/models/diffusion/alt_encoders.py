"""Alternative conditioning encoders (SCube-heritage modes of _forward_cond).

Mirror of /root/reference/infinicube/voxelgen/modules/encoders/ beyond the
release map/box encoders (encoders.py): SemanticEncoder / ClassEmbedder
(modules.py:23-220), PointNetEncoder (point_encoder.py:62), Lift3DEncoder
image->voxel scatter (lift3d_encoder.py:227), and LssEncoder lift-splat-shoot
with a depth-distribution head (lss_encoder.py:327). These power the adm /
crossattn / single-scan / image-w-depth / LSS conditioning flags the
reference defaults in diffusion.Model.__init__ (diffusion.py:87-157)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.camera import projection as proj


class ClassEmbedder(nn.Module):
    """Class id -> embedding (adm conditioning; modules.ClassEmbedder)."""
    num_classes: int
    embed_dim: int

    @nn.compact
    def __call__(self, class_ids: jnp.ndarray) -> jnp.ndarray:
        return nn.Embed(self.num_classes, self.embed_dim)(class_ids)


class SemanticEncoder(nn.Module):
    """Per-voxel semantic embedding concat channels (modules.SemanticEncoder)."""
    num_classes: int = 23
    embed_dim: int = 32

    @nn.compact
    def __call__(self, semantics: jnp.ndarray) -> jnp.ndarray:
        return nn.Embed(self.num_classes, self.embed_dim)(
            jnp.clip(semantics, 0, self.num_classes - 1))


class PointNetEncoder(nn.Module):
    """Set encoder: per-point MLP + masked max-pool -> global feature
    (point_encoder.PointNetEncoder; the single-scan conditioning path)."""
    width: int = 128
    out_dim: int = 256

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """points f32[B, N, 3], mask bool[B, N] -> f32[B, out_dim]."""
        h = nn.Dense(self.width)(points)
        h = nn.relu(nn.Dense(self.width)(nn.relu(h)))
        h = jnp.where(mask[..., None], h, -jnp.inf)
        g = jnp.max(h, axis=1)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return nn.Dense(self.out_dim)(g)


class Lift3DEncoder(nn.Module):
    """Image features lifted to a dense voxel cube by projecting voxel
    centers into the views and averaging (lift3d_encoder.py:227: image ->
    voxel scatter; here the equivalent gather formulation)."""
    feat_dim: int = 32

    @nn.compact
    def __call__(self, images: jnp.ndarray, Ks: jnp.ndarray,
                 cam_to_worlds: jnp.ndarray, cube_centers: jnp.ndarray
                 ) -> jnp.ndarray:
        """images f32[V, H, W, 3]; cube_centers f32[D, H', W', 3] world.
        Returns f32[D, H', W', feat_dim]."""
        V, H, W, _ = images.shape
        feats = nn.Conv(self.feat_dim, (3, 3), name="conv")(images)
        pts = cube_centers.reshape(-1, 3)

        def per_view(K, pose, f):
            uv, z, valid = proj.project_points(pts, pose, K, (H, W))
            u = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
            v = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
            g = f[v, u]
            return jnp.where(valid[:, None], g, 0.0), valid.astype(jnp.float32)

        g, v = jax.vmap(per_view)(Ks, cam_to_worlds, feats)
        out = g.sum(0) / jnp.maximum(v.sum(0)[:, None], 1.0)
        return out.reshape(cube_centers.shape[:-1] + (self.feat_dim,))


@dataclasses.dataclass(frozen=True)
class LssConfig:
    feat_dim: int = 32
    depth_bins: int = 32
    d_min: float = 1.0
    d_max: float = 40.0


class LssEncoder(nn.Module):
    """Lift-splat-shoot: per-pixel depth distribution x features splatted
    into the voxel cube (lss_encoder.py:327). The depth head can be
    supervised with a focal loss against lidar depth (lss_encoder.py:219) —
    see ``depth_distribution_loss``."""
    cfg: LssConfig = LssConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, Ks: jnp.ndarray,
                 cam_to_worlds: jnp.ndarray, cube_dims, ijk_min,
                 voxel_size, origin):
        """-> (cube f32[D, H', W', feat_dim], depth_logits [V, H, W, bins])."""
        cfg = self.cfg
        V, H, W, _ = images.shape
        h = nn.Conv(64, (3, 3), strides=(2, 2), name="stem")(images)
        h = nn.relu(h)
        h = nn.Conv(cfg.feat_dim + cfg.depth_bins, (3, 3), name="head")(h)
        feats, dlog = jnp.split(h, [cfg.feat_dim], axis=-1)
        dprob = jax.nn.softmax(dlog, axis=-1)
        Hs, Ws = feats.shape[1:3]
        depths = jnp.linspace(cfg.d_min, cfg.d_max, cfg.depth_bins)

        D, Hc, Wc = cube_dims
        vs = jnp.asarray(voxel_size)
        org = jnp.asarray(origin)
        flat_n = D * Hc * Wc

        def per_view(K, pose, f, dp):
            Ks_half = K.at[:2].mul(Hs / H)
            rays = proj.rays_from_intrinsics(Ks_half, (Hs, Ws),
                                             normalize=False)
            pts = rays[None] * depths[:, None, None, None]      # [B, Hs, Ws, 3]
            world = jnp.einsum("ij,bhwj->bhwi", pose[:3, :3], pts) + \
                pose[:3, 3]
            w = (dp.transpose(2, 0, 1))[..., None]              # [B, Hs, Ws, 1]
            contrib = f[None] * w                                # features x p
            ijk = jnp.round((world - org) / vs).astype(jnp.int32) - \
                jnp.asarray(ijk_min)
            ok = jnp.all((ijk >= 0) & (ijk < jnp.array([D, Hc, Wc])), -1)
            flat = (ijk[..., 0] * Hc + ijk[..., 1]) * Wc + ijk[..., 2]
            flat = jnp.where(ok, flat, flat_n).reshape(-1)
            acc = jnp.zeros((flat_n, cfg.feat_dim)).at[flat].add(
                contrib.reshape(-1, cfg.feat_dim), mode="drop")
            cnt = jnp.zeros((flat_n,)).at[flat].add(
                jnp.where(ok, w[..., 0], 0).reshape(-1), mode="drop")
            return acc, cnt

        acc, cnt = jax.vmap(per_view)(Ks, cam_to_worlds, feats, dprob)
        cube = acc.sum(0) / jnp.maximum(cnt.sum(0)[:, None], 1e-6)
        return cube.reshape(D, Hc, Wc, cfg.feat_dim), dlog


def depth_distribution_loss(depth_logits: jnp.ndarray, gt_depth: jnp.ndarray,
                            cfg: LssConfig, gamma: float = 2.0):
    """Focal CE of the LSS depth distribution vs binned lidar depth
    (lss_encoder FocalLoss, :219)."""
    Hs, Ws = depth_logits.shape[1:3]
    gt = jax.image.resize(gt_depth, gt_depth.shape[:1] + (Hs, Ws), "nearest")
    valid = gt > 0
    bins = jnp.clip(((gt - cfg.d_min) / (cfg.d_max - cfg.d_min) *
                     (cfg.depth_bins - 1)), 0, cfg.depth_bins - 1)
    bins = bins.astype(jnp.int32)
    lp = jax.nn.log_softmax(depth_logits, axis=-1)
    pt = jnp.take_along_axis(lp, bins[..., None], -1)[..., 0]
    focal = -((1 - jnp.exp(pt)) ** gamma) * pt
    return jnp.sum(focal * valid) / jnp.maximum(jnp.sum(valid), 1.0)


class StructEncoder(nn.Module):
    """Encode a partial/coarse structure grid into concat channels
    (modules.StructEncoder*: the single-scan-crop conditioning)."""
    feat_dim: int = 16

    @nn.compact
    def __call__(self, occupancy: jnp.ndarray) -> jnp.ndarray:
        """occupancy f32[B, D, H, W, 1] -> [B, D, H, W, feat_dim]."""
        h = nn.Conv(self.feat_dim, (3, 3, 3), name="c1")(occupancy)
        return nn.Conv(self.feat_dim, (3, 3, 3), name="c2")(nn.relu(h))
