"""Causal 3D video VAE (Wan2.1-style): 8x spatial, 4x temporal compression.

Capability mirror of the reference's external Wan video VAE (SURVEY.md §2.1
N6): video [T, H, W, 3] with T = 1 + 4k maps to latents
[1 + k, H/8, W/8, 16]; the first frame is compressed only spatially (causal
temporal convs, no future leakage), so single images round-trip and streaming
decode works chunk-by-chunk. Also used to encode the semantic/coordinate
guidance-buffer videos for DiT conditioning (videogen/inference.py:86).

TPU notes: channels-last, bf16 activations, GroupNorm in f32; spatial tiling
for decode under HBM limits mirrors the reference's ``tiled=True``
(inference.py:171)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.models.diffusion.unet3d import GroupNorm32 as _GN


class GroupNormPerFrame(nn.Module):
    """GroupNorm with statistics per (batch, frame) — time-global stats would
    leak future frames into the past and break causality."""

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        y = _GN()(x.reshape(B * T, H, W, C))
        return y.reshape(B, T, H, W, C)


GroupNorm32 = GroupNormPerFrame


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    latent_channels: int = 16
    base_channels: int = 96
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Any = jnp.bfloat16
    scaling_factor: float = 1.0


class CausalConv3d(nn.Module):
    """3D conv, causal in time (left pad), SAME in space."""
    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding="VALID", dtype=self.dtype)(x)


class VAEResBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.silu(GroupNorm32()(x))
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv1")(h)
        h = nn.silu(GroupNorm32()(h))
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, dtype=self.dtype, name="skip")(x)
        return x + h


class TemporalDown(nn.Module):
    """1 + 2k frames -> 1 + k frames; first frame passes through."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        first = nn.Dense(self.features, dtype=self.dtype, name="first")(x[:, :1])
        rest = CausalConv3d(self.features, kernel=(3, 1, 1),
                            strides=(2, 1, 1), dtype=self.dtype,
                            name="down")(x)[:, 1:]
        # strided causal conv over T frames yields ceil(T/2); frames at odd
        # indices 1,3,... of the original map to outputs 1..k
        return jnp.concatenate([first, rest], axis=1)


class TemporalUp(nn.Module):
    """1 + k frames -> 1 + 2k frames; first frame passes through."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        first = nn.Dense(self.features, dtype=self.dtype, name="first")(x[:, :1])
        rest = nn.Dense(2 * self.features, dtype=self.dtype,
                        name="up")(x[:, 1:])
        rest = rest.reshape(B, T - 1, H, W, 2, self.features)
        rest = rest.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * (T - 1), H, W,
                                                        self.features)
        return jnp.concatenate([first, rest], axis=1)


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, video):
        """video f32[B, T, H, W, 3] in [-1, 1], T = 1 + 4k ->
        (mu, logvar) [B, 1+k, H/8, W/8, latent]."""
        cfg = self.cfg
        ch = cfg.base_channels
        x = CausalConv3d(ch, dtype=cfg.dtype, name="stem")(
            video.astype(cfg.dtype))
        for lvl, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                x = VAEResBlock(ch * mult, dtype=cfg.dtype,
                                name=f"enc{lvl}_{i}")(x)
            if lvl < len(cfg.channel_mult) - 1:
                # spatial down x2
                x = nn.Conv(x.shape[-1], (1, 3, 3), strides=(1, 2, 2),
                            dtype=cfg.dtype, name=f"sdown{lvl}")(x)
                if lvl < 2:  # temporal down x2 twice -> 4x
                    x = TemporalDown(x.shape[-1], dtype=cfg.dtype,
                                     name=f"tdown{lvl}")(x)
        x = VAEResBlock(x.shape[-1], dtype=cfg.dtype, name="mid")(x)
        x = nn.silu(GroupNorm32()(x))
        stats = nn.Conv(2 * cfg.latent_channels, (1, 1, 1),
                        dtype=jnp.float32, name="to_stats")(
            x.astype(jnp.float32))
        mu, logvar = jnp.split(stats, 2, axis=-1)
        return mu, jnp.clip(logvar, -30.0, 20.0)


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        mults = list(cfg.channel_mult)[::-1]
        ch = cfg.base_channels
        x = nn.Conv(ch * mults[0], (1, 1, 1), dtype=cfg.dtype,
                    name="from_z")(z.astype(cfg.dtype))
        x = VAEResBlock(x.shape[-1], dtype=cfg.dtype, name="mid")(x)
        for lvl, mult in enumerate(mults):
            for i in range(cfg.num_res_blocks):
                x = VAEResBlock(ch * mult, dtype=cfg.dtype,
                                name=f"dec{lvl}_{i}")(x)
            if lvl < len(mults) - 1:
                B, T, H, W, C = x.shape
                x = jax.image.resize(x, (B, T, 2 * H, 2 * W, C), "nearest")
                x = nn.Conv(C, (1, 3, 3), dtype=cfg.dtype,
                            name=f"sup{lvl}")(x)
                if lvl >= len(mults) - 3:  # mirror the two temporal downs
                    x = TemporalUp(C, dtype=cfg.dtype, name=f"tup{lvl}")(x)
        x = nn.silu(GroupNorm32()(x))
        x = CausalConv3d(3, dtype=jnp.float32, name="to_rgb")(
            x.astype(jnp.float32))
        return jnp.tanh(x)


class VideoVAE(nn.Module):
    cfg: VideoVAEConfig = VideoVAEConfig()

    def setup(self):
        self.encoder = VideoEncoder(self.cfg)
        self.decoder = VideoDecoder(self.cfg)

    def encode(self, video, rng=None):
        mu, logvar = self.encoder(video)
        if rng is None:
            return mu
        return mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)

    def decode(self, z):
        return self.decoder(z)

    def decode_tiled(self, z, tile: int = 32, overlap: int = 4):
        """Spatially tiled decode with linear blending (the reference's
        tiled=True VRAM path, videogen/inference.py:171). Host-level loop —
        each tile decode is one jitted call."""
        B, T, H, W, C = z.shape
        scale = 8
        out = jnp.zeros((B, 1 + 4 * (T - 1), H * scale, W * scale, 3))
        acc = jnp.zeros((1, 1, H * scale, W * scale, 1))
        step = tile - overlap
        for i0 in range(0, max(H - overlap, 1), step):
            for j0 in range(0, max(W - overlap, 1), step):
                i1, j1 = min(i0 + tile, H), min(j0 + tile, W)
                dec = self.decoder(z[:, :, i0:i1, j0:j1])
                wy = _blend_profile(i1 - i0, overlap * scale)
                wx = _blend_profile(j1 - j0, overlap * scale)
                wgt = (wy[:, None] * wx[None, :])[None, None, :, :, None]
                out = out.at[:, :, i0 * scale:i1 * scale,
                             j0 * scale:j1 * scale].add(dec * wgt)
                acc = acc.at[:, :, i0 * scale:i1 * scale,
                             j0 * scale:j1 * scale].add(wgt)
        return out / jnp.maximum(acc, 1e-6)

    def __call__(self, video, rng):
        z = self.encode(video, rng)
        return self.decode(z)


def _blend_profile(n_latent: int, ramp: int) -> jnp.ndarray:
    n = n_latent * 8
    w = jnp.ones((n,))
    r = jnp.minimum(ramp, n // 2)
    ramp_up = (jnp.arange(r) + 1.0) / (r + 1.0)
    w = w.at[:r].set(ramp_up).at[-r:].set(ramp_up[::-1])
    return w
