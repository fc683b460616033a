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
    width: int = 32                     # XUnet dim / init_dim (release: 32)
    dims: tuple = (1, 2, 4, 8)          # release XUnet dim_mults
    blocks_per_stage: tuple = (2, 2, 2, 2)   # num_blocks_per_stage
    self_attn_per_stage: tuple = (0, 0, 0, 0)  # num_self_attn_per_stage
    out_dim: int = 24                   # unet2d_params.out_dim
    attn_heads: int = 4
    consolidate_upsample_fmaps: bool = True
    unet_remat: bool = True             # remat each ResBlock/attn: backward
    # otherwise saves ~3 full-res conv/GN intermediates per block (65 MB
    # each at 3x480x704xw) and the release train step OOMs one v5e
    gs_per_pixel: int = 2
    view_chunk: int = 4                 # UNet views per chunk: the XUnet's
    # full-res temps are [V, H, W, 128] f32 (3.05 GB EACH at 16 views @
    # 480p — five of them live at once, a measured release-inference HBM
    # OOM); chunking the per-view-independent UNet bounds the peak at
    # view_chunk/V of that. Training (3 views) runs a single chunk.
    znear: float = 0.3
    zfar: float = 200.0
    max_scale: float = 0.4              # world units
    depth_dropout: float = 0.5          # masked_voxel_depth patch dropout
    dtype: Any = jnp.float32


class ResBlock2D(nn.Module):
    """XUnet ResnetBlock: GN -> silu -> 3x3 conv, twice, + skip (projected
    1x1 when widths differ)."""
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x))
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h))
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class SelfAttn2D(nn.Module):
    """Spatial self-attention over H*W tokens (XUnet Attention; used at the
    bottleneck and per-stage when num_self_attn_per_stage > 0)."""
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        t = h.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(t)
        q, k, v = (a.reshape(B, H * W, self.heads, C // self.heads)
                   for a in jnp.split(qkv, 3, axis=-1))
        # memory-linear dispatch: at the release 480x704 input the mid
        # level has 5280 tokens — a materialized [B, h, N, N] f32 logit
        # tensor is 1.27 GB and OOMs the train step; the flash kernel
        # handles head_dim 64 (measured 6 ms fwd at this shape)
        from infinicube_tpu.ops.attention import multi_head_attention
        o = multi_head_attention(q, k, v).reshape(B, H * W, C)
        return x + nn.Dense(C, dtype=self.dtype,
                            name="out")(o).reshape(B, H, W, C)


class UNet2D(nn.Module):
    """XUnet-structured 2D UNet at the reference's release config
    (dual_branch_backbone.yaml:41-49: dim 32, dim_mults [1,2,4,8], 2 ResNet
    blocks/stage, no per-stage self-attention, mid attention,
    consolidate_upsample_fmaps): 7x7 init conv, per-stage ResBlock stacks,
    attention + ResBlocks at the bottleneck, and an FPN-style consolidation
    that upsamples every decoder stage's output to full resolution and
    fuses them for the final feature map (x_unet XUnet semantics)."""
    cfg: PixelBranchConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        w = cfg.width
        Res = nn.remat(ResBlock2D) if cfg.unet_remat else ResBlock2D
        Attn = nn.remat(SelfAttn2D) if cfg.unet_remat else SelfAttn2D
        h = nn.Conv(w, (7, 7), dtype=cfg.dtype, name="stem")(x)
        skips = []
        for i, m in enumerate(cfg.dims):
            for b in range(cfg.blocks_per_stage[i]):
                h = Res(w * m, cfg.dtype, name=f"d{i}b{b}")(h)
            for a in range(cfg.self_attn_per_stage[i]):
                h = Attn(cfg.attn_heads, cfg.dtype,
                         name=f"d{i}a{a}")(h)
            skips.append(h)
            if i < len(cfg.dims) - 1:
                h = nn.Conv(w * cfg.dims[i + 1], (3, 3), strides=(2, 2),
                            dtype=cfg.dtype, name=f"down{i}")(h)
        # bottleneck: ResBlock -> attention -> ResBlock (XUnet mid)
        h = Res(h.shape[-1], cfg.dtype, name="mid1")(h)
        h = Attn(cfg.attn_heads, cfg.dtype, name="mid_attn")(h)
        h = Res(h.shape[-1], cfg.dtype, name="mid2")(h)
        stage_outs = []
        for i in range(len(cfg.dims) - 1, -1, -1):
            if i < len(cfg.dims) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(w * cfg.dims[i], (3, 3), dtype=cfg.dtype,
                            name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            for b in range(cfg.blocks_per_stage[i]):
                h = Res(w * cfg.dims[i], cfg.dtype,
                        name=f"u{i}b{b}")(h)
            for a in range(cfg.self_attn_per_stage[i]):
                h = Attn(cfg.attn_heads, cfg.dtype,
                         name=f"u{i}a{a}")(h)
            stage_outs.append(h)
        if cfg.consolidate_upsample_fmaps:
            B, H, W, _ = stage_outs[-1].shape
            pyramid = [
                nn.Conv(w, (3, 3), dtype=cfg.dtype, name=f"cons{j}")(
                    jax.image.resize(s, (B, H, W, s.shape[-1]), "nearest"))
                for j, s in enumerate(stage_outs)]
            h = jnp.concatenate(pyramid, axis=-1)
        h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h))
        return nn.Conv(cfg.out_dim, (3, 3), dtype=cfg.dtype,
                       name="final")(h)


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
        unet = UNet2D(cfg, name="unet")
        vc = cfg.view_chunk or V
        if vc >= V:
            feats = unet(x)
        else:
            # repeated calls to the same named submodule share parameters;
            # disjoint chunk liveness lets XLA serialize the UNet temps
            feats = jnp.concatenate(
                [unet(x[i:i + vc]) for i in range(0, V, vc)], axis=0)
        K = cfg.gs_per_pixel
        out = nn.Dense(K * 13, name="head")(feats).reshape(V, H, W, K, 13)

        def rays(Km, pose):
            return proj.posed_rays_from_intrinsics(Km, pose, (H, W),
                                                   normalize=False)
        ro, rd = jax.vmap(rays)(Ks, cam_to_worlds)         # [V, H, W, 3]

        # ---- gaussian assembly, component-wise on flat [M] arrays -------
        # TPU tile-padding trap (CLAUDE.md / gsplat round 2): any
        # intermediate with the trailing K=2 (or xyz=3) dim materializes
        # onto (8,128) tiles at up to 64x expansion — a measured 1.45 GB
        # HLO temp for a 23 MB tensor in the train step's backward. All
        # per-gaussian math therefore runs on flat [M] per-component
        # arrays; only the final stacked outputs carry a small minor dim
        # (XLA lays rank-2 [M, 3] out transposed, which pads 3 -> 8 only).
        def ch(i):                                         # head ch -> [M]
            return out[..., i].reshape(-1)

        def perk(a):                                       # [V,H,W] -> [M]
            return jnp.broadcast_to(a[..., None],
                                    (V, H, W, K)).reshape(-1)

        s = nn.sigmoid(ch(0))                              # depth in [0,1]
        depth = cfg.znear + s * (cfg.zfar - cfg.znear)     # [M]
        # blend toward the provided prior where present (provided_depth mode)
        has_prior = perk(depth_prior[..., 0] > 0)
        prior = perk(depth_prior[..., 0])
        gate = nn.sigmoid(ch(1))
        depth = jnp.where(has_prior, prior * (1 - 0.25 * (gate - 0.5)),
                          depth)
        means = jnp.stack(
            [perk(ro[..., c]) + perk(rd[..., c]) * depth for c in range(3)],
            axis=-1)                                       # [M, 3]
        srad = cfg.max_scale * (depth / 10.0 + 0.1)
        scales = jnp.stack(
            [jnp.exp(jnp.clip(ch(2 + c), -10.0, 0.0)) * srad
             for c in range(3)], axis=-1)
        q = [ch(5 + c) + (1.0 if c == 0 else 0.0) for c in range(4)]
        qn = jnp.maximum(jnp.sqrt(sum(x * x for x in q)), 1e-6)
        quats = jnp.stack([x / qn for x in q], axis=-1)
        opacity = nn.sigmoid(ch(9))
        # rgb = input pixel color + bounded residual
        colors = jnp.stack(
            [jnp.clip(perk(rgb[..., c]) + nn.sigmoid(ch(10 + c)) - 0.5,
                      0.0, 1.0) for c in range(3)], axis=-1)
        if decode_all or pixel_mask is None:
            valid = jnp.ones((V * H * W * K,), bool)
        else:
            valid = perk(pixel_mask)

        return {"means": means, "scales": scales, "quats": quats,
                "opacities": jnp.where(valid, opacity, 0.0),
                "colors": colors, "valid": valid,
                "depth": depth.reshape(V, H, W, K)}
