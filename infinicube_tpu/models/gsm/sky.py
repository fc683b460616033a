"""Learned sky models.

Mirrors the reference's sky module family
(/root/reference/infinicube/voxelgen/modules/sky_modules/):

- **SkyboxMlpModulator** (skybox_mlp_modulator.py:109-450): sky pixels are
  patch-embedded (patches with sky ratio > threshold), ray-direction
  pos-encoded, and a small transformer with a learned sky query produces a
  per-scene sky token; sampling = an MLP over ray directions FiLM-modulated
  by the token.
- **SkyboxPanoramaFull** (skybox_panorama_full.py:203-610): an explicit
  equirectangular panorama optimized per scene, sampled by lat-long lookup.
- **SkyboxNull** (skybox_null.py:24): constant background.

Panorama direction math lives in utils/sky_math.py."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.utils.sky_math import direction_to_latlong_uv


def posenc_dir(d: jnp.ndarray, freqs: int = 4) -> jnp.ndarray:
    out = [d]
    for i in range(freqs):
        out += [jnp.sin(d * 2.0 ** i), jnp.cos(d * 2.0 ** i)]
    return jnp.concatenate(out, axis=-1)


@dataclasses.dataclass(frozen=True)
class SkyConfig:
    kind: str = "mlp_modulator"        # mlp_modulator | panorama | null
    embed_dim: int = 192               # release sky embed 192
    num_layers: int = 3
    num_heads: int = 4
    patch: int = 8
    sky_ratio_threshold: float = 0.75
    max_sky_tokens: int = 1024         # top-K sky patches kept (reference
    # selects ratio>0.75 patches only, skybox_mlp_modulator.py:109-450;
    # full attention over every patch of 3 high-res views is O(N^2) memory)
    pano_hw: tuple = (128, 256)
    dtype: Any = jnp.float32


class SkyboxMlpModulator(nn.Module):
    cfg: SkyConfig = SkyConfig()

    @nn.compact
    def encode(self, images: jnp.ndarray, sky_mask: jnp.ndarray,
               ray_dirs: jnp.ndarray) -> jnp.ndarray:
        """images f32[V, H, W, 3]; sky_mask bool[V, H, W]; ray_dirs
        [V, H, W, 3] -> sky token f32[embed_dim]."""
        cfg = self.cfg
        V, H, W, _ = images.shape
        p = cfg.patch
        ph, pw = H // p, W // p
        x = jnp.concatenate([images, posenc_dir(ray_dirs)], axis=-1)
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(x)                  # [V, ph, pw, E]
        ratio = nn.avg_pool(sky_mask[..., None].astype(jnp.float32),
                            (p, p), strides=(p, p))[..., 0]
        ratio_flat = ratio.reshape(-1)
        tokens = x.reshape(-1, cfg.embed_dim)
        # keep only the top-K skyest patches (capacity-compacted token set:
        # the reference embeds the ratio>threshold patches only)
        K = min(cfg.max_sky_tokens, tokens.shape[0])
        top_ratio, top_idx = jax.lax.top_k(ratio_flat, K)
        tokens = tokens[top_idx][None]                      # [1, K, E]
        keep = (top_ratio > cfg.sky_ratio_threshold)[None]  # [1, K]
        query = self.param("sky_query", nn.initializers.normal(0.02),
                           (1, 1, cfg.embed_dim))
        seq = jnp.concatenate([query, tokens], axis=1)
        mask = jnp.concatenate([jnp.ones((1, 1), bool), keep], axis=1)
        for i in range(cfg.num_layers):
            h = nn.LayerNorm()(seq)
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, dtype=cfg.dtype, name=f"attn{i}")(
                h, h, mask=mask[:, None, None, :])
            seq = seq + h
            h = nn.LayerNorm()(seq)
            h = nn.Dense(cfg.embed_dim * 4, dtype=cfg.dtype)(h)
            seq = seq + nn.Dense(cfg.embed_dim, dtype=cfg.dtype)(nn.gelu(h))
        return seq[0, 0]

    @nn.compact
    def sample(self, token: jnp.ndarray, ray_dirs: jnp.ndarray) -> jnp.ndarray:
        """token [E]; ray_dirs (..., 3) -> sky rgb (..., 3) in [0, 1]."""
        cfg = self.cfg
        # compute in cfg.dtype, norms f32 (matches the branch convention):
        # at [V, H, W] resolution each f32 [.., embed_dim] activation is a
        # ~780 MB backward residual (measured in the r4 GSM OOM dump)
        h = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="in")(
            posenc_dir(ray_dirs))
        for i in range(3):
            mod = nn.Dense(2 * cfg.embed_dim, dtype=cfg.dtype,
                           name=f"mod{i}")(token)
            scale, shift = jnp.split(mod, 2, axis=-1)
            h = nn.silu(nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(h)
                        * (1 + scale) + shift).astype(cfg.dtype)
            h = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name=f"fc{i}")(h)
        return nn.sigmoid(nn.Dense(3, dtype=cfg.dtype,
                                   name="out")(h).astype(jnp.float32))

    def __call__(self, images, sky_mask, ray_dirs, sample_dirs):
        token = self.encode(images, sky_mask, ray_dirs)
        return self.sample(token, sample_dirs), token


class SkyboxPanorama(nn.Module):
    """Explicit equirect panorama (optimized parameter map)."""
    cfg: SkyConfig = SkyConfig()

    @nn.compact
    def __call__(self, sample_dirs: jnp.ndarray) -> jnp.ndarray:
        H, W = self.cfg.pano_hw
        pano = self.param("pano", nn.initializers.constant(0.5), (H, W, 3))
        uv = direction_to_latlong_uv(sample_dirs)
        u = jnp.clip(uv[..., 0] * (W - 1), 0, W - 1.001)
        v = jnp.clip(uv[..., 1] * (H - 1), 0, H - 1.001)
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        du, dv = (u - u0)[..., None], (v - v0)[..., None]
        c = (pano[v0, u0] * (1 - du) * (1 - dv) +
             pano[v0, jnp.minimum(u0 + 1, W - 1)] * du * (1 - dv) +
             pano[jnp.minimum(v0 + 1, H - 1), u0] * (1 - du) * dv +
             pano[jnp.minimum(v0 + 1, H - 1), jnp.minimum(u0 + 1, W - 1)]
             * du * dv)
        return jnp.clip(c, 0.0, 1.0)


class SkyboxNull(nn.Module):
    """Constant background color (skybox_null.py:24)."""
    color: tuple = (0.0, 0.0, 0.0)

    @nn.compact
    def __call__(self, sample_dirs: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self.color),
                                sample_dirs.shape[:-1] + (3,))
