"""Causal 3D video VAE — checkpoint-shaped Wan2.1 architecture.

The reference's video stage runs entirely on the pretrained Wan2.1 video VAE
(/root/reference/infinicube/videogen/inference.py:63-81 loads
``Wan2.1_VAE.pth``); this module mirrors that architecture exactly so the
released weights convert (weights/wan_convert.py):

- CausalConv3d: temporal pad 2*pt entirely on the left (zero pad), SAME
  spatial — frame t never sees t+1; single images round-trip and streaming
  decode works chunk-by-chunk,
- RMS_norm over channels per spatial location (gamma [C]),
- ResidualBlock(residual: RMS/SiLU/conv/RMS/SiLU/conv + 1x1 shortcut),
- AttentionBlock: per-frame single-head attention over H*W (middle only;
  attn_scales=[] in the release config),
- Resample: downsample2d (zero-pad right/bottom + stride-2 conv),
  downsample3d (+ VALID stride-2 temporal conv, first frame passthrough),
  upsample2d (nearest 2x + conv C->C/2), upsample3d (causal temporal conv
  C->2C interleaved to double frames, first frame passthrough),
- per-channel latent mean/std normalization (the published Wan2.1 stats).

T = 1 + 4k frames <-> 1 + k latent frames; 8x spatial. Streaming-cache
first-frame semantics are reconstructed from the public architecture and
validated against the torch mirror in tests/torch_mirrors/wan_vae_torch.py
(bit-parity against the real .pth requires the weights themselves).

TPU notes: channels-last, bf16 activations with f32 norms, whole-clip
processing (no chunk loop — HBM fits 93f@480p), spatially tiled decode
mirroring the reference's ``tiled=True`` (inference.py:171).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.ops.dense_conv import Conv3x3x3

# Published Wan2.1 per-channel latent statistics (wan/modules/vae.py): the
# DiT consumes z_hat = (z - mean) / std.
WAN_LATENT_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
WAN_LATENT_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)


@dataclasses.dataclass(frozen=True)
class VideoVAEConfig:
    latent_channels: int = 16                   # z_dim
    base_channels: int = 96                     # dim
    channel_mult: Sequence[int] = (1, 2, 4, 4)  # dim_mult
    num_res_blocks: int = 2
    temporal_down: Sequence[bool] = (False, True, True)  # temperal_downsample
    dtype: Any = jnp.bfloat16
    # (3,3,3) stride-1 conv backend for the ResidualBlock convs. Default
    # "xla": measured 52-63 TF/s at the release tile shapes (decode tile
    # 64x32 = 1.74 s, encode tile 512x256 = 1.01 s — docs/PERF.md round 4),
    # and the tiled paths are NOT conv-bound after the tile-program
    # memoization fix (the old 62 s/encode was per-call recompiles). The
    # Pallas implicit-GEMM option ("auto"/"pallas", ops/dense_conv.py,
    # equivalence-gated in tests/test_wan.py) is kept for conv-bound
    # configs, but its three dy-shifted input views triple input HBM and
    # OOM the big pixel-resolution stages beside a resident DiT.
    conv_impl: str = "xla"
    latent_mean: Sequence[float] | None = None
    latent_std: Sequence[float] | None = None

    @staticmethod
    def wan21(**kw) -> "VideoVAEConfig":
        base = dict(latent_mean=WAN_LATENT_MEAN, latent_std=WAN_LATENT_STD)
        base.update(kw)
        return VideoVAEConfig(**base)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)

    @property
    def temporal_scale(self) -> int:
        # only the stages the truncated channel_mult actually instantiates
        return 2 ** sum(self.temporal_down[: len(self.channel_mult) - 1])


# ---------------------------------------------------------------------------
# building blocks (names mirror the torch state dict for conversion)
# ---------------------------------------------------------------------------

class RMSNormCh(nn.Module):
    """Wan RMS_norm: x / ||x||_C * sqrt(C) * gamma, per spatial location
    (torch F.normalize over the channel dim). gamma [C]."""

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        y = xf / jnp.maximum(n, 1e-12) * jnp.sqrt(x.shape[-1])
        return (y * g).astype(x.dtype)


def causal_conv3d(x, features, name, kernel=(3, 3, 3), strides=(1, 1, 1),
                  dtype=jnp.bfloat16, tctx=None, impl="xla"):
    """Temporal pad 2*pt on the left (zeros), SAME in space — must be called
    inside a parent @nn.compact so the conv params live directly under
    ``name`` (clean torch-key conversion).

    ``tctx``: streaming feature cache — the previous chunk's last 2*(kt//2)
    frames at this layer, prepended INSTEAD of the zero pad (the Wan2.1
    feat_cache decode semantics: mid-stream chunks see real history, only
    the clip start sees zeros).

    ``impl``: "xla" (nn.Conv, the oracle), or "auto"/"pallas" — route
    eligible (3,3,3) stride-1 convs through the Pallas implicit-GEMM
    kernel (ops/dense_conv.py, identical param tree). The causal conv is
    expressed through the kernel's all-SAME conv: the input already carries
    its 2-frame left history, so SAME_out[t+1] == causal_out[t] exactly
    (SAME's temporal zero halo only feeds the two sliced-off frames)."""
    kt, kh, kw = kernel
    if kt > 1:
        if tctx is None:
            x = jnp.pad(x, ((0, 0), (2 * (kt // 2), 0), (0, 0), (0, 0),
                            (0, 0)))
        else:
            x = jnp.concatenate([tctx.astype(x.dtype), x], axis=1)
    if (impl != "xla" and tuple(kernel) == (3, 3, 3)
            and tuple(strides) == (1, 1, 1)
            and x.shape[-1] >= 64 and features >= 64):
        y = Conv3x3x3(features, dtype=dtype, impl=impl, name=name)(x)
        return y[:, 1:-1]
    x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2),
                    (kw // 2, kw // 2), (0, 0)))
    return nn.Conv(features, kernel, strides=strides, padding="VALID",
                   dtype=dtype, name=name)(x)


def _cc3d_stream(x, features, name, cache, key, kernel=(3, 3, 3),
                 dtype=jnp.bfloat16, impl="xla"):
    """causal_conv3d + cache bookkeeping: reads cache[key] (None on the
    first chunk), writes the next chunk's context (this chunk's last 2
    input frames INCLUDING inherited context, so chunks of 1 work)."""
    kt = kernel[0]
    ctx = None if cache is None else cache.get(key)
    nctx = 2 * (kt // 2)
    # context for the NEXT chunk: last nctx frames of this layer's padded
    # input (zero pad at clip start, so 1-frame first chunks still hand a
    # full-length context forward)
    if ctx is None:
        src = jnp.pad(x, ((0, 0), (nctx, 0), (0, 0), (0, 0), (0, 0)))
    else:
        src = jnp.concatenate([ctx.astype(x.dtype), x], axis=1)
    new_ctx = src[:, -nctx:] if nctx else None
    out = causal_conv3d(x, features, name, kernel=kernel, dtype=dtype,
                        tctx=ctx, impl=impl)
    return out, new_ctx


class ResidualBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, cache=None, streaming=False):
        """``streaming``: thread the per-conv temporal feature cache
        (``cache`` None on the first chunk) and also return the new cache."""
        h = nn.silu(RMSNormCh(name="residual_0")(x))
        if streaming:
            new = {}
            h, new["residual_2"] = _cc3d_stream(
                h, self.features, "residual_2", cache, "residual_2",
                dtype=self.dtype, impl=self.impl)
            h = nn.silu(RMSNormCh(name="residual_3")(h))
            h, new["residual_6"] = _cc3d_stream(
                h, self.features, "residual_6", cache, "residual_6",
                dtype=self.dtype, impl=self.impl)
        else:
            h = causal_conv3d(h, self.features, "residual_2",
                              dtype=self.dtype, impl=self.impl)
            h = nn.silu(RMSNormCh(name="residual_3")(h))
            h = causal_conv3d(h, self.features, "residual_6",
                              dtype=self.dtype, impl=self.impl)
        if x.shape[-1] != self.features:
            x = causal_conv3d(x, self.features, "shortcut",
                              kernel=(1, 1, 1), dtype=self.dtype)
        return (x + h, new) if streaming else x + h


class AttentionBlock(nn.Module):
    """Per-frame single-head attention over H*W (Wan AttentionBlock)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = RMSNormCh(name="norm")(x)
        qkv = nn.Dense(3 * C, dtype=jnp.float32, name="to_qkv")(
            h.astype(jnp.float32))
        q, k, v = jnp.split(qkv.reshape(B * T, H * W, 3 * C), 3, axis=-1)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(C)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bqk,bkc->bqc", attn, v)
        o = nn.Dense(C, dtype=jnp.float32, name="proj")(o)
        return x + o.reshape(B, T, H, W, C).astype(x.dtype)


class Downsample2D(nn.Module):
    """ZeroPad2d((0,1,0,1)) + stride-2 conv (per frame)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
                       dtype=self.dtype, name="resample_1")(x)


class Downsample3D(nn.Module):
    """Spatial stride-2 then temporal stride-2: 1+2k -> 1+k frames, first
    frame passthrough (the streaming feat-cache net effect: output i>=1 is
    conv(x[2i-2:2i+1]))."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.Conv(C, (1, 3, 3), strides=(1, 2, 2), padding="VALID",
                    dtype=self.dtype, name="resample_1")(x)
        rest = nn.Conv(C, (3, 1, 1), strides=(2, 1, 1), padding="VALID",
                       dtype=self.dtype, name="time_conv")(x)
        return jnp.concatenate([x[:, :1], rest], axis=1)


class Upsample2D(nn.Module):
    """Nearest 2x + conv C -> C//2 (per frame)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return nn.Conv(C // 2, (1, 3, 3), dtype=self.dtype,
                       name="resample_1")(x)


class Upsample3D(nn.Module):
    """Causal temporal conv C -> 2C interleaved to double frames (first
    frame passthrough), then nearest 2x + conv C -> C//2."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cache=None, streaming=False):
        B, T, H, W, C = x.shape
        if streaming:
            t2, new_ctx = _cc3d_stream(x, 2 * C, "time_conv", cache,
                                       "time_conv", kernel=(3, 1, 1),
                                       dtype=self.dtype)
            if cache is None:   # clip start: first frame passes through raw
                pair = t2[:, 1:].reshape(B, T - 1, H, W, 2, C)
                pair = pair.transpose(0, 1, 4, 2, 3, 5).reshape(
                    B, 2 * (T - 1), H, W, C)
                x = jnp.concatenate([x[:, :1], pair], axis=1)
            else:               # mid-stream: every frame pair-expands
                pair = t2.reshape(B, T, H, W, 2, C)
                x = pair.transpose(0, 1, 4, 2, 3, 5).reshape(
                    B, 2 * T, H, W, C)
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            out = nn.Conv(C // 2, (1, 3, 3), dtype=self.dtype,
                          name="resample_1")(x)
            return out, {"time_conv": new_ctx}
        t2 = causal_conv3d(x, 2 * C, "time_conv", kernel=(3, 1, 1),
                           dtype=self.dtype)
        pair = t2[:, 1:].reshape(B, T - 1, H, W, 2, C)
        pair = pair.transpose(0, 1, 4, 2, 3, 5).reshape(
            B, 2 * (T - 1), H, W, C)
        x = jnp.concatenate([x[:, :1], pair], axis=1)
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return nn.Conv(C // 2, (1, 3, 3), dtype=self.dtype,
                       name="resample_1")(x)


# ---------------------------------------------------------------------------
# schedules shared with the converter (weights/wan_convert.py)
# ---------------------------------------------------------------------------

def encoder_schedule(cfg: VideoVAEConfig):
    """[(index, kind, features)] of encoder.downsamples entries."""
    dims = [cfg.base_channels * m for m in (1,) + tuple(cfg.channel_mult)]
    out, idx = [], 0
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            out.append((idx, "res", d_out))
            idx += 1
        if i != len(cfg.channel_mult) - 1:
            kind = "down3d" if cfg.temporal_down[i] else "down2d"
            out.append((idx, kind, d_out))
            idx += 1
    return out


def decoder_schedule(cfg: VideoVAEConfig):
    """[(index, kind, features)] of decoder.upsamples entries."""
    mult = list(cfg.channel_mult)
    dims = [cfg.base_channels * m for m in [mult[-1]] + mult[::-1]]
    # reversed TRUNCATED flags: only the stages channel_mult instantiates
    # (the full-list form silently made truncated test configs temporally
    # asymmetric between encoder and decoder)
    t_up = list(cfg.temporal_down[: len(mult) - 1])[::-1]
    out, idx = [], 0
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks + 1):
            out.append((idx, "res", d_out))
            idx += 1
        if i != len(mult) - 1:
            kind = "up3d" if t_up[i] else "up2d"
            out.append((idx, kind, d_out))
            idx += 1
    return out


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, video):
        """video f32[B, T, H, W, 3] in [-1, 1], T = 1 + temporal_scale*k ->
        stats [B, 1+k, H/s, W/s, 2*latent] (raw mu ++ logvar)."""
        cfg = self.cfg
        x = causal_conv3d(video.astype(cfg.dtype), cfg.base_channels,
                          "conv1", dtype=cfg.dtype)
        for idx, kind, feat in encoder_schedule(cfg):
            name = f"downsamples_{idx}"
            if kind == "res":
                x = ResidualBlock(feat, dtype=cfg.dtype, name=name,
                                  impl=cfg.conv_impl)(x)
            elif kind == "down2d":
                x = Downsample2D(dtype=cfg.dtype, name=name)(x)
            else:
                x = Downsample3D(dtype=cfg.dtype, name=name)(x)
        x = ResidualBlock(x.shape[-1], dtype=cfg.dtype, name="middle_0",
                          impl=cfg.conv_impl)(x)
        x = AttentionBlock(dtype=cfg.dtype, name="middle_1")(x)
        x = ResidualBlock(x.shape[-1], dtype=cfg.dtype, name="middle_2",
                          impl=cfg.conv_impl)(x)
        x = nn.silu(RMSNormCh(name="head_0")(x))
        return causal_conv3d(x.astype(jnp.float32),
                             2 * cfg.latent_channels, "head_2",
                             dtype=jnp.float32)


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z, cache=None, streaming=False):
        """``streaming``: chunked decode with the per-conv temporal feature
        cache (the Wan2.1 feat_cache semantics). First chunk: cache=None;
        later chunks consume the previous return. Returns (frames, cache)
        when streaming. AttentionBlock/RMSNorm/2D resamples are per-frame
        (stateless in time); only kt=3 causal convs carry state."""
        cfg = self.cfg
        dims0 = cfg.base_channels * cfg.channel_mult[-1]
        new: dict = {}

        def sub(c, name):
            return None if c is None else c.get(name)

        if streaming:
            x, new["conv1"] = _cc3d_stream(z.astype(cfg.dtype), dims0,
                                           "conv1", cache, "conv1",
                                           dtype=cfg.dtype)
            x, new["middle_0"] = ResidualBlock(
                dims0, dtype=cfg.dtype, name="middle_0",
                impl=cfg.conv_impl)(
                    x, sub(cache, "middle_0"), streaming=True)
            x = AttentionBlock(dtype=cfg.dtype, name="middle_1")(x)
            x, new["middle_2"] = ResidualBlock(
                dims0, dtype=cfg.dtype, name="middle_2",
                impl=cfg.conv_impl)(
                    x, sub(cache, "middle_2"), streaming=True)
            for idx, kind, feat in decoder_schedule(cfg):
                name = f"upsamples_{idx}"
                if kind == "res":
                    x, new[name] = ResidualBlock(
                        feat, dtype=cfg.dtype, name=name,
                        impl=cfg.conv_impl)(
                            x, sub(cache, name), streaming=True)
                elif kind == "up2d":
                    x = Upsample2D(dtype=cfg.dtype, name=name)(x)
                else:
                    x, new[name] = Upsample3D(dtype=cfg.dtype, name=name)(
                        x, sub(cache, name), streaming=True)
            x = nn.silu(RMSNormCh(name="head_0")(x))
            x, new["head_2"] = _cc3d_stream(x.astype(jnp.float32), 3,
                                            "head_2", cache, "head_2",
                                            dtype=jnp.float32)
            return jnp.clip(x, -1.0, 1.0), new
        x = causal_conv3d(z.astype(cfg.dtype), dims0, "conv1",
                          dtype=cfg.dtype)
        x = ResidualBlock(dims0, dtype=cfg.dtype, name="middle_0",
                          impl=cfg.conv_impl)(x)
        x = AttentionBlock(dtype=cfg.dtype, name="middle_1")(x)
        x = ResidualBlock(dims0, dtype=cfg.dtype, name="middle_2",
                          impl=cfg.conv_impl)(x)
        for idx, kind, feat in decoder_schedule(cfg):
            name = f"upsamples_{idx}"
            if kind == "res":
                x = ResidualBlock(feat, dtype=cfg.dtype, name=name,
                                  impl=cfg.conv_impl)(x)
            elif kind == "up2d":
                x = Upsample2D(dtype=cfg.dtype, name=name)(x)
            else:
                x = Upsample3D(dtype=cfg.dtype, name=name)(x)
        x = nn.silu(RMSNormCh(name="head_0")(x))
        x = causal_conv3d(x.astype(jnp.float32), 3, "head_2",
                          dtype=jnp.float32)
        return jnp.clip(x, -1.0, 1.0)


class VideoVAE(nn.Module):
    cfg: VideoVAEConfig = VideoVAEConfig()

    def setup(self):
        cfg = self.cfg
        self.encoder = VideoEncoder(cfg)
        self.quant_conv = nn.Conv(               # torch key: conv1
            2 * cfg.latent_channels, (1, 1, 1), dtype=jnp.float32,
            name="conv1")
        self.post_quant_conv = nn.Conv(          # torch key: conv2
            cfg.latent_channels, (1, 1, 1), dtype=jnp.float32,
            name="conv2")
        self.decoder = VideoDecoder(cfg)

    def _scale(self):
        cfg = self.cfg
        if cfg.latent_mean is None:
            return None, None
        return (jnp.asarray(cfg.latent_mean, jnp.float32),
                jnp.asarray(cfg.latent_std, jnp.float32))

    def encode(self, video, rng=None):
        """[B, T, H, W, 3] in [-1,1] -> normalized latents
        [B, 1+k, H/s, W/s, z]. rng enables reparameterized sampling
        (mu-only, the Wan encode semantics, when rng is None)."""
        stats = self.quant_conv(self.encoder(video))
        mu, logvar = jnp.split(stats, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mu = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape)
        mean, std = self._scale()
        if mean is not None:
            mu = (mu - mean) / std
        return mu

    def decode(self, z):
        mean, std = self._scale()
        if mean is not None:
            z = z * std + mean
        return self.decoder(self.post_quant_conv(z.astype(jnp.float32)))

    def decode_step(self, z_chunk, cache=None):
        """One streaming-decode chunk (Wan2.1 feat_cache semantics: the
        real .pth decodes chunk-by-chunk carrying per-conv temporal state).
        Exactly equals the whole-clip ``decode`` frame-for-frame —
        tests/test_wan.py::test_streaming_decode_matches_whole_clip.
        Returns (frames, cache); pass the cache to the next chunk."""
        mean, std = self._scale()
        if mean is not None:
            z_chunk = z_chunk * std + mean
        return self.decoder(self.post_quant_conv(z_chunk.astype(jnp.float32)),
                            cache, streaming=True)

    def __call__(self, video, rng=None):
        return self.decode(self.encode(video, rng))


def decode_streaming_host(vae: "VideoVAE", params, z, chunk: int = 2):
    """Streaming decode: latent chunks through ``decode_step`` with the
    carried feature cache — O(chunk) temporal activation memory instead of
    the whole clip (the Wan2.1 feat_cache serving mode). Two jitted
    programs: the first chunk (zero-history) and the steady-state chunk.
    Returns frames [B, 1 + ts*(T-1), H*s, W*s, 3] on the host."""
    import numpy as _np

    B, T = z.shape[:2]
    first = _cached(("str_first", vae.cfg), lambda: jax.jit(
        lambda p, zc: vae.apply(p, zc, method=VideoVAE.decode_step)))
    step = _cached(("str_step", vae.cfg), lambda: jax.jit(
        lambda p, zc, c: vae.apply(p, zc, c, method=VideoVAE.decode_step)))
    c0 = min(chunk, T)
    out, cache = first(params, z[:, :c0])
    frames = [_np.asarray(jax.device_get(out))]
    t = c0
    while t < T:
        c = min(chunk, T - t)
        # the ragged tail reuses the same cached jitted step (jit re-
        # specializes per input shape internally, so one function object
        # serves every chunk length without per-call retraces)
        out, cache = step(params, z[:, t:t + c], cache)
        frames.append(_np.asarray(jax.device_get(out)))
        t += c
    return _np.concatenate(frames, axis=1)


# jitted tile-program cache: decode/encode_tiled_host build their per-tile
# jitted update as a local closure; without memoization every CALL creates a
# fresh function object, misses jax.jit's cache, and pays a full recompile
# (~30-40 s through the axon remote-compile per call — measured: the
# in-pipeline tiled decode ran 44 s/call vs 7.5 s with the program reused).
# Keyed by (kind, cfg, shape tuple); a serving process sees a handful of
# shapes, so the cache stays tiny.
_TILE_JIT_CACHE: dict = {}


def _cached(key, build):
    fn = _TILE_JIT_CACHE.get(key)
    if fn is None:
        fn = _TILE_JIT_CACHE[key] = build()
    return fn


def _blend_profile(n: int, ramp: int) -> jnp.ndarray:
    w = jnp.ones((n,))
    r = min(ramp, n // 2)
    if r > 0:
        ramp_up = (jnp.arange(r) + 1.0) / (r + 1.0)
        w = w.at[:r].set(ramp_up).at[-r:].set(ramp_up[::-1])
    return w


def decode_tiled_host(vae: "VideoVAE", params, z, tile=(64, 32),
                      overlap: int = 4, to_uint8: bool = False):
    """Serving-path tiled decode: ONE jitted fixed-shape tile decode
    (z is edge-padded so every tile has the same latent extent); blending
    accumulates ON DEVICE into a donated float32 canvas (f32 keeps the
    overlap blend exact; the canvas is ~240 MB at 93f 480p, small next to
    the tile activations) — peak activation
    memory is a single tile's (~tile^2/(H*W) of the full-frame decode, which
    needs ~20 GB at 93f 480p), and the video crosses to the host ONCE
    (as uint8 when ``to_uint8`` — the axon tunnel moves ~28 MB/s, so
    per-tile f32 readback costs more than the decode itself)."""
    import numpy as _np

    B, T, H, W, C = z.shape
    th, tw = (tile, tile) if isinstance(tile, int) else tile
    # an axis covered by ONE tile uses the exact extent — padding it to
    # tile+overlap would feed edge-replicated latents into the conv /
    # attention windows and make the single-tile decode differ from the
    # full decode for no reason
    th, tw = min(th, H), min(tw, W)
    scale = vae.cfg.spatial_scale
    t_out = 1 + vae.cfg.temporal_scale * (T - 1)
    ys = list(range(0, max(H - overlap, 1), th - overlap))
    xs = list(range(0, max(W - overlap, 1), tw - overlap))
    pad_h = ys[-1] + th - H
    pad_w = xs[-1] + tw - W
    Hp, Wp = (ys[-1] + th) * scale, (xs[-1] + tw) * scale
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, max(pad_h, 0)),
                     (0, max(pad_w, 0)), (0, 0)), mode="edge")

    def build_upd():
        wy = _blend_profile(th * scale, overlap * scale)
        wx = _blend_profile(tw * scale, overlap * scale)
        wgt = (wy[:, None] * wx[None, :])[None, None, :, :, None]

        @partial(jax.jit, donate_argnums=(0, 1))
        def upd(out, acc, p, zt, oy, ox):
            d = vae.apply(p, zt, method=VideoVAE.decode)
            cur = jax.lax.dynamic_slice(
                out, (0, 0, oy, ox, 0),
                (B, t_out, th * scale, tw * scale, 3))
            out = jax.lax.dynamic_update_slice(
                out, cur + (d * wgt).astype(out.dtype), (0, 0, oy, ox, 0))
            ca = jax.lax.dynamic_slice(
                acc, (0, 0, oy, ox, 0), (1, 1, th * scale, tw * scale, 1))
            acc = jax.lax.dynamic_update_slice(
                acc, ca + wgt.astype(acc.dtype), (0, 0, oy, ox, 0))
            return out, acc
        return upd

    def build_fin():
        @jax.jit
        def fin(out, acc):
            final = out[:, :, :H * scale, :W * scale] / \
                jnp.maximum(acc[:, :, :H * scale, :W * scale], 1e-6)
            if to_uint8:
                final = jnp.clip(final * 0.5 + 0.5, 0, 1) * 255
                final = final.astype(jnp.uint8)
            return final
        return fin

    shp = (B, T, H, W, th, tw, overlap, bool(to_uint8))
    upd = _cached(("dec_upd", vae.cfg, shp), build_upd)
    fin = _cached(("dec_fin", vae.cfg, shp), build_fin)

    out = jnp.zeros((B, t_out, Hp, Wp, 3), jnp.float32)
    acc = jnp.zeros((1, 1, Hp, Wp, 1), jnp.float32)
    for i0 in ys:
        for j0 in xs:
            out, acc = upd(out, acc, params,
                           zp[:, :, i0:i0 + th, j0:j0 + tw],
                           i0 * scale, j0 * scale)
    return _np.asarray(jax.device_get(fin(out, acc)))


def encode_tiled_host(vae: "VideoVAE", params, video, tile=(512, 256),
                      overlap: int = 32):
    """Serving-path tiled ENCODE (pixel-space tiles, latent-space blend):
    full-frame encode of 93f @ 480p needs the same ~20 GB the full-frame
    decode does. ``tile``/``overlap`` are in pixels and must be multiples of
    the spatial scale. Returns latents [B, T', H/s, W/s, z] on device."""
    B, T, H, W, _ = video.shape
    scale = vae.cfg.spatial_scale
    th, tw = (tile, tile) if isinstance(tile, int) else tile
    # single-tile axes use the exact extent (see decode_tiled_host)
    th, tw = min(th, H), min(tw, W)
    assert th % scale == 0 and tw % scale == 0 and overlap % scale == 0
    ys = list(range(0, max(H - overlap, 1), th - overlap))
    xs = list(range(0, max(W - overlap, 1), tw - overlap))
    pad_h = ys[-1] + th - H
    pad_w = xs[-1] + tw - W
    vp = jnp.pad(video, ((0, 0), (0, 0), (0, max(pad_h, 0)),
                         (0, max(pad_w, 0)), (0, 0)), mode="edge")
    ls = scale
    Hp, Wp = (ys[-1] + th) // ls, (xs[-1] + tw) // ls
    t_lat = 1 + (T - 1) // vae.cfg.temporal_scale
    zc = vae.cfg.latent_channels

    def build_upd():
        wy = _blend_profile(th // ls, overlap // ls)
        wx = _blend_profile(tw // ls, overlap // ls)
        wgt = (wy[:, None] * wx[None, :])[None, None, :, :, None]

        @partial(jax.jit, donate_argnums=(0, 1))
        def upd(out, acc, p, vt, oy, ox):
            zt = vae.apply(p, vt, method=VideoVAE.encode)
            cur = jax.lax.dynamic_slice(
                out, (0, 0, oy, ox, 0), (B, t_lat, th // ls, tw // ls, zc))
            out = jax.lax.dynamic_update_slice(
                out, cur + (zt * wgt).astype(out.dtype), (0, 0, oy, ox, 0))
            ca = jax.lax.dynamic_slice(
                acc, (0, 0, oy, ox, 0), (1, 1, th // ls, tw // ls, 1))
            acc = jax.lax.dynamic_update_slice(
                acc, ca + wgt.astype(acc.dtype), (0, 0, oy, ox, 0))
            return out, acc
        return upd

    def build_fin():
        @jax.jit
        def fin(out, acc):
            return out[:, :, :H // ls, :W // ls] / \
                jnp.maximum(acc[:, :, :H // ls, :W // ls], 1e-6)
        return fin

    shp = (B, T, H, W, th, tw, overlap)
    upd = _cached(("enc_upd", vae.cfg, shp), build_upd)
    fin = _cached(("enc_fin", vae.cfg, shp), build_fin)

    out = jnp.zeros((B, t_lat, Hp, Wp, zc), jnp.float32)
    acc = jnp.zeros((1, 1, Hp, Wp, 1), jnp.float32)
    for i0 in ys:
        for j0 in xs:
            out, acc = upd(out, acc, params,
                           vp[:, :, i0:i0 + th, j0:j0 + tw],
                           i0 // ls, j0 // ls)
    return fin(out, acc)
