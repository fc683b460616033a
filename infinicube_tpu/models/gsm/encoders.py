"""GSM image encoders.

Mirror of the reference's UnifiedEncoder + encoder modules
(/root/reference/infinicube/voxelgen/modules/gsm_modules/encoder/):
a ModuleDict of per-frame image encoders (release: conv + frozen DAv2) whose
features are concatenated per pixel, plus the 4-channel GSM input-mask
semantics (unified_encoder.py:61-126):
  ch0: foreground (0 = sky)  ch1: non-dynamic  ch2: hood/pad crop
  ch3: foreground from voxel grid
sky_mask = ch0 == 0; effective_mask = ch1 * ch2.

Encoder kinds: "conv" (exact mirror of conv_encoder.py), "dav2" (frozen
checkpoint-shaped Depth-Anything-V2 tower + trainable refiner — see
models/gsm/dav2.py and weights convert_dav2_hf), and "vit" (a generic patch
ViT retained as a lightweight stand-in for configs without DAv2 weights),
and "plucker" (conv patchifier over rgb+plucker-ray channels,
plucker_conv_patch_encoder.py)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvEncoder(nn.Module):
    """Small residual CNN 3->width (reference conv_encoder.py:23)."""
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):  # [B, H, W, 3]
        x = nn.Conv(self.width, (3, 3), dtype=self.dtype)(images)
        for i in range(2):
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x))
            h = nn.Conv(self.width, (3, 3), dtype=self.dtype,
                        name=f"res{i}_c1")(h)
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h))
            h = nn.Conv(self.width, (3, 3), dtype=self.dtype,
                        name=f"res{i}_c2")(h)
            x = x + h
        return x


class PatchViTEncoder(nn.Module):
    """Generic patch ViT feature tower (stand-in for the frozen
    Depth-Anything-V2 / DINOv2 encoders, dav2_encoder.py:35)."""
    width: int = 128
    patch: int = 14
    depth: int = 4
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, _ = images.shape
        ph, pw = H // self.patch, W // self.patch
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype)(images)
        x = x.reshape(B, ph * pw, self.width)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, ph * pw, self.width))
        x = x + pos
        for i in range(self.depth):
            h = nn.LayerNorm()(x)
            h = nn.SelfAttention(num_heads=self.num_heads,
                                 dtype=self.dtype, name=f"attn{i}")(h)
            x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(4 * self.width, dtype=self.dtype)(h)
            h = nn.Dense(self.width, dtype=self.dtype)(nn.gelu(h))
            x = x + h
        x = x.reshape(B, ph, pw, self.width)
        # upsample back to pixel grid
        import jax
        return jax.image.resize(x, (B, H, W, self.width), "bilinear")


class DAV2FeatureEncoder(nn.Module):
    """Frozen checkpoint-shaped Depth-Anything-V2 tower + trainable
    upsampler (reference DAV2Encoder, dav2_encoder.py:36-121): resize to the
    target grid, imagenet-normalize, take the LAST DPT fusion map
    (stop-gradient — the tower is frozen), then a small trainable conv
    refiner, resized back to pixel resolution."""
    width: int = 64
    target_hw: tuple = (252, 336)       # multiple of 14
    dav2: Any = None                    # DAv2Config (None -> vits)

    @nn.compact
    def __call__(self, images):  # [B, H, W, 3] in [0, 1]
        import jax
        from infinicube_tpu.models.gsm.dav2 import (
            IMAGENET_MEAN, IMAGENET_STD, DAv2Config, DepthAnythingFeatures)
        cfg = self.dav2 or DAv2Config.vits()
        B, H, W, _ = images.shape
        th, tw = self.target_hw
        x = jax.image.resize(images, (B, th, tw, 3), "bilinear")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        fused = DepthAnythingFeatures(cfg, name="features")(x)[-1]
        fused = jax.lax.stop_gradient(fused)     # frozen tower
        h = nn.Conv(self.width, (3, 3), name="up0")(fused)
        r = nn.relu(nn.Conv(self.width, (3, 3), name="up1")(nn.relu(h)))
        h = h + nn.Conv(self.width, (3, 3), name="up2")(r)
        return jax.image.resize(h, (B, H, W, self.width), "bilinear")


class DinoFeatureEncoder(nn.Module):
    """Frozen standalone DINOv2 ViT (reference dinov2_encoder.py in the
    UnifiedEncoder ModuleDict) + trainable refiner: resize to a patch
    multiple, imagenet-normalize, take the LAST backbone tap (cls dropped,
    stop-gradient), conv refiner, resize back. Checkpoints load via
    ``dav2.convert_dinov2_hf`` (HF Dinov2Model layout)."""
    width: int = 64
    target_hw: tuple = (252, 336)       # multiple of 14
    dino: Any = None                    # DAv2Config (None -> vits geometry)

    @nn.compact
    def __call__(self, images):  # [B, H, W, 3] in [0, 1]
        import jax
        from infinicube_tpu.models.gsm.dav2 import (
            IMAGENET_MEAN, IMAGENET_STD, DAv2Config, Dinov2Backbone)
        cfg = self.dino or DAv2Config.vits()
        B, H, W, _ = images.shape
        th, tw = self.target_hw
        x = jax.image.resize(images, (B, th, tw, 3), "bilinear")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        tap = Dinov2Backbone(cfg, name="backbone")(x)[-1]
        tap = jax.lax.stop_gradient(tap[:, 1:])          # drop cls; frozen
        ph, pw = th // cfg.patch, tw // cfg.patch
        f = tap.reshape(B, ph, pw, cfg.hidden_size)
        h = nn.Conv(self.width, (3, 3), name="up0")(f)
        r = nn.relu(nn.Conv(self.width, (3, 3), name="up1")(nn.relu(h)))
        h = h + nn.Conv(self.width, (3, 3), name="up2")(r)
        return jax.image.resize(h, (B, H, W, self.width), "bilinear")


class PluckerConvPatchEncoder(nn.Module):
    """Conv patchifier over [rgb | plucker rays | depth] channels (reference
    plucker_conv_patch_encoder.py:5-108): per-pixel plucker coordinates
    (d, o x d) from the camera, optional metric depth channel, stride-patch
    conv + LayerNorm, resized back to the pixel grid."""
    width: int = 64
    patch: int = 8
    concat_plucker: bool = True
    concat_depth: bool = False

    @nn.compact
    def __call__(self, images, Ks=None, cam_to_worlds=None, depth=None):
        import jax
        from infinicube_tpu.camera import projection as proj
        B, H, W, _ = images.shape
        parts = [images]
        if self.concat_plucker and Ks is not None:
            ro, rd = jax.vmap(lambda K, p: proj.posed_rays_from_intrinsics(
                K, p, (H, W)))(Ks, cam_to_worlds)
            moment = jnp.cross(ro, rd)
            parts += [rd, moment]
        if self.concat_depth and depth is not None:
            parts.append(depth)
        x = jnp.concatenate(parts, axis=-1)
        p = self.patch
        x = nn.Conv(self.width, (p, p), strides=(p, p),
                    name="conv_patchify")(x)
        x = nn.LayerNorm(name="ln")(x)
        return jax.image.resize(x, (B, H, W, self.width), "bilinear")


@dataclasses.dataclass(frozen=True)
class UnifiedEncoderConfig:
    # + "dav2" / "vit" / "plucker" / "dino" / "convnext"
    encoders: Sequence[str] = ("conv",)
    conv_width: int = 64
    vit_width: int = 128
    dav2_width: int = 64
    dav2_target_hw: tuple = (252, 336)
    dav2_config: Any = None                 # DAv2Config override (tests)
    plucker_width: int = 64
    plucker_patch: int = 8
    dino_width: int = 64
    dino_target_hw: tuple = (252, 336)
    dino_config: Any = None                 # DAv2Config override (tests)
    convnext_width: int = 64
    convnext_config: Any = None             # ConvNextConfig override


class UnifiedEncoder(nn.Module):
    cfg: UnifiedEncoderConfig = UnifiedEncoderConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, masks: jnp.ndarray,
                 Ks: jnp.ndarray | None = None,
                 cam_to_worlds: jnp.ndarray | None = None,
                 depth: jnp.ndarray | None = None):
        """images f32[B, V, H, W, 3] in [0,1]; masks f32[B, V, H, W, 4];
        Ks/cam_to_worlds [B, V, ...] (needed by the "plucker" kind).
        Returns dict: features [B, V, H, W, F], sky_mask, effective_mask,
        original_rgb."""
        B, V, H, W, _ = images.shape
        flat = images.reshape(B * V, H, W, 3)
        feats = []
        if "conv" in self.cfg.encoders:
            feats.append(ConvEncoder(self.cfg.conv_width, name="conv")(flat))
        if "vit" in self.cfg.encoders:
            feats.append(PatchViTEncoder(self.cfg.vit_width, name="vit")(flat))
        if "dav2" in self.cfg.encoders:
            feats.append(DAV2FeatureEncoder(
                self.cfg.dav2_width, self.cfg.dav2_target_hw,
                self.cfg.dav2_config, name="dav2")(flat))
        if "dino" in self.cfg.encoders:
            feats.append(DinoFeatureEncoder(
                self.cfg.dino_width, self.cfg.dino_target_hw,
                self.cfg.dino_config, name="dino")(flat))
        if "convnext" in self.cfg.encoders:
            from infinicube_tpu.models.gsm.convnext import (
                ConvNextConfig, ConvNextFeatureEncoder)
            feats.append(ConvNextFeatureEncoder(
                self.cfg.convnext_width,
                self.cfg.convnext_config or ConvNextConfig(),
                name="convnext")(flat))
        if "plucker" in self.cfg.encoders:
            feats.append(PluckerConvPatchEncoder(
                self.cfg.plucker_width, self.cfg.plucker_patch,
                name="plucker")(
                flat,
                None if Ks is None else Ks.reshape(B * V, 3, 3),
                None if cam_to_worlds is None
                else cam_to_worlds.reshape(B * V, 4, 4),
                None if depth is None
                else depth.reshape(B * V, H, W, -1)))
        f = jnp.concatenate(feats, axis=-1).reshape(B, V, H, W, -1)
        sky_mask = masks[..., 0] == 0
        effective = masks[..., 1] * masks[..., 2]
        # midground = fg-from-seg minus fg-from-grid: the region the pixel
        # branch is responsible for (reference scene_gaussian_generation.py
        # :444-446 "from_seg - from_grid = midground area")
        midground = (masks[..., 0] > 0) & (masks[..., 3] == 0)
        return {"features": f, "sky_mask": sky_mask,
                "effective_mask": effective, "midground": midground,
                "original_rgb": images}
