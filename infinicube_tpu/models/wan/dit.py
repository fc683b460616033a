"""Wan2.1-style video diffusion transformer (DiT) with buffer conditioning
and tensor/sequence-parallel sharding over the device mesh.

Capability mirror of the reference's external DiffSynth Wan2.1 fork
(SURVEY.md §2.1 N6; /root/reference/infinicube/videogen/inference.py:26-241):
a T2V DiT (1.3B / 14B) over causal-video-VAE latents, text conditioning via
cross-attention to umt5-xxl embeddings, and — the InfiniCube addition — a
zero-initialized **buffer embedder**: the VAE-encoded semantic+coordinate
guidance-buffer videos are patchified and ADDED to the noisy video tokens
(``initialize_buffer_embedder(buffer_channels=16, zero_init=True)``,
inference.py:84-88, README.md:65).

TPU-first design (a NEW capability vs the reference, which runs single-GPU
with CPU offload):
- attention heads and FFN hidden dims carry flax logical partitioning
  metadata ("heads" / "ffn" -> mesh axis "model") so the 14B checkpoints
  shard over ICI via NamedSharding; tokens can shard over "seq",
- activations in bf16, f32 softmax/norms, static token counts
  (93f @ 480p -> (1 + 92/4) x 60/2 x 104/2 = 24x30x52 = 37,440 tokens),
- the whole 50-step euler sampler jits as one program (flow_match.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

LOGICAL_RULES = (
    ("batch", "data"),
    ("seq", None),            # shard over "seq" for SP by overriding
    ("embed", None),
    ("embed_in", None),
    ("heads", "model"),
    ("kv", None),
    ("ffn", "model"),
    ("patch", None),
    ("text", None),
    ("out", None),
    ("layers", None),  # stacked-block axis under scan_layers
)


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    dim: int = 1536                 # 1.3B; 14B: 5120
    ffn_dim: int = 8960             # 14B: 13824
    num_layers: int = 30            # 14B: 40
    num_heads: int = 12             # 14B: 40
    in_channels: int = 16           # video VAE latent channels
    out_channels: int = 16
    text_dim: int = 4096            # umt5-xxl hidden
    freq_dim: int = 256
    # sequence parallelism: when set (e.g. "seq"), self-attention runs as
    # ring attention over that mesh axis (tokens sharded over ICI) instead
    # of the single-device flash kernel — requires an ambient jax mesh with
    # the axis (jax.set_mesh); cross-attention stays local (text context is
    # replicated)
    sp_axis: str | None = None
    # int8 serving path (inference-only; rounding has no useful gradient):
    # attn_quant routes self-attention through the specialized int8 flash
    # kernel (ops/flash_attention.py: "qk" = int8 QK^T, "qkv" = also int8
    # PV); quant_linear runs the block projections/FFN on the int8 MXU
    # (nn/quant.py). Both are quality-gated (cosine >= 0.999 vs bf16,
    # tests/test_quant.py) and measured 1.3-1.5x on v5e (docs/PERF.md).
    attn_quant: str | None = None
    quant_linear: bool = False
    # dtype of the CARRIED residual stream between blocks (LN/adaLN math is
    # always f32 internally). f32 default for training; bf16 halves the
    # elementwise HBM traffic for serving (the torch reference serves bf16
    # end-to-end) and sits under the same cosine >= 0.999 gate.
    residual_dtype: Any = jnp.float32
    patch_size: tuple = (1, 2, 2)
    buffer_channels: int = 32       # 2 x VAE-encoded buffer videos
    use_buffer_embedder: bool = True
    dtype: Any = jnp.bfloat16
    scan_layers: bool = True        # nn.scan over blocks: one traced block
    # instead of num_layers copies — 7x faster compile AND ~6% faster
    # steady-state on v5e; params gain a leading layer axis (weights/convert
    # stacks per-block torch weights accordingly)

    @staticmethod
    def wan_1_3b(**kw) -> "WanDiTConfig":
        return WanDiTConfig(**kw)

    @staticmethod
    def wan_14b(**kw) -> "WanDiTConfig":
        base = dict(dim=5120, ffn_dim=13824, num_layers=40, num_heads=40)
        base.update(kw)
        return WanDiTConfig(**base)


def rope_3d(thw: tuple[int, int, int], head_dim: int) -> jnp.ndarray:
    """Precompute 3D RoPE angles. Returns f32[T*H*W, head_dim//2]: frequency
    channels split between the t/h/w axes."""
    T, H, W = thw
    half = head_dim // 2
    d_t = half - 2 * (half // 3)
    d_h = d_w = half // 3

    def axis_angles(n, d):
        inv = 1.0 / (10000.0 ** (jnp.arange(d, dtype=jnp.float32) / d))
        return jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None]

    at = axis_angles(T, d_t)            # [T, d_t]
    ah = axis_angles(H, d_h)
    aw = axis_angles(W, d_w)
    ang = jnp.concatenate([
        jnp.broadcast_to(at[:, None, None, :], (T, H, W, d_t)),
        jnp.broadcast_to(ah[None, :, None, :], (T, H, W, d_h)),
        jnp.broadcast_to(aw[None, None, :, :], (T, H, W, d_w)),
    ], axis=-1)
    return ang.reshape(T * H * W, half)


def apply_rope(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, h, d]; angles [N, d//2].

    Rotates HALF-SPLIT pairs (x[j], x[j + d/2]) by angles[j] — the fast TPU
    layout (two contiguous slices instead of a stride-2 de-interleave).
    Upstream Wan2.1 rotates INTERLEAVED pairs (x[2j], x[2j+1]) via
    view_as_complex; the two are equivalent under a fixed per-head channel
    permutation [evens..., odds...] applied to the q/k projection outputs,
    which `weights.convert._rope_interleave_to_halfsplit` applies when
    converting pretrained checkpoints (attention dot products are invariant
    to any channel permutation applied to q and k alike)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1).astype(x.dtype)


def _dense(features, axes, name, dtype, zero=False, quant=False):
    init = nn.initializers.zeros if zero else \
        nn.initializers.lecun_normal()
    if quant:
        from infinicube_tpu.nn.quant import QuantDense
        return QuantDense(features, axes=axes, dtype=dtype, name=name,
                          kernel_init=init)
    return nn.Dense(features, dtype=dtype, name=name,
                    kernel_init=nn.with_logical_partitioning(init, axes))


class WanAttention(nn.Module):
    cfg: WanDiTConfig
    cross: bool = False
    sp_mesh: Any = None      # concrete mesh for ring-attention shard_map

    @nn.compact
    def __call__(self, x, context=None, rope_angles=None):
        cfg = self.cfg
        B, N, C = x.shape
        h, hd = cfg.num_heads, cfg.dim // cfg.num_heads
        # fused projections: one [C, 3C] (self) / q + [C, 2C] (cross) matmul
        # instead of three — fewer, larger MXU calls (the converter concats
        # the reference's separate q/k/v weights to match)
        qt = cfg.quant_linear
        if self.cross:
            q = _dense(C, ("embed_in", "heads"), "q", cfg.dtype, quant=qt)(x)
            kv = _dense(2 * C, ("embed_in", "heads"), "kv",
                        cfg.dtype)(context)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = _dense(3 * C, ("embed_in", "heads"), "qkv", cfg.dtype,
                         quant=qt)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        # Wan applies RMSNorm over the FULL dim (all heads at once) before
        # the head reshape — upstream WanSelfAttention norm_q(self.q(x)) on
        # [B, L, dim]; per-head normalization would change the denominator.
        q = nn.RMSNorm(dtype=jnp.float32, name="q_norm")(q).reshape(
            B, -1, h, hd)
        k = nn.RMSNorm(dtype=jnp.float32, name="k_norm")(k).reshape(
            B, -1, h, hd)
        v = v.reshape(B, -1, h, hd)
        if not self.cross and rope_angles is not None:
            q = apply_rope(q, rope_angles)
            k = apply_rope(k, rope_angles)
        q = q.astype(cfg.dtype)
        k = k.astype(cfg.dtype)
        if cfg.sp_axis and not self.cross:
            # sequence-parallel exact attention over the mesh axis (tokens
            # sharded over cfg.sp_axis by the caller's in_shardings)
            from infinicube_tpu.ops.ring_attention import ring_attention
            out = ring_attention(q, k, v, self.sp_mesh, axis=cfg.sp_axis)
        elif cfg.attn_quant and not self.cross:
            # int8 MXU flash attention (serving path; quality-gated)
            from infinicube_tpu.ops.flash_attention import mha_quantized
            out = mha_quantized(q, k, v, quant=cfg.attn_quant)
        else:
            from infinicube_tpu.ops.attention import multi_head_attention
            out = multi_head_attention(q, k, v)  # Pallas flash kernel on TPU
        out = out.reshape(B, N, C)
        return _dense(C, ("heads", "embed"), "o", cfg.dtype, quant=qt)(out)


class WanBlock(nn.Module):
    cfg: WanDiTConfig
    sp_mesh: Any = None

    @nn.compact
    def __call__(self, x, t_mod, context, rope_angles):
        """t_mod f32[B, 6, C] adaLN params (shift/scale/gate x2)."""
        cfg = self.cfg
        # per-block learned modulation bias (Wan's shared-adaLN + block bias)
        bias = self.param("mod_bias", nn.initializers.zeros, (6, cfg.dim))
        m = t_mod + bias[None]
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, i, None, :] for i in range(6)]

        h = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=jnp.float32)(x)
        h = h * (1 + sc1) + sh1
        x = x + g1 * WanAttention(cfg, sp_mesh=self.sp_mesh,
                                  name="self_attn")(
            h.astype(cfg.dtype), rope_angles=rope_angles)
        # cross-attn to text (no modulation, Wan-style)
        h = nn.LayerNorm(dtype=jnp.float32, name="cross_norm")(x)
        x = x + WanAttention(cfg, cross=True, name="cross_attn")(
            h.astype(cfg.dtype), context=context)
        h = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=jnp.float32)(x)
        h = h * (1 + sc2) + sh2
        h = _dense(cfg.ffn_dim, ("embed_in", "ffn"), "ffn_in", cfg.dtype,
                   quant=cfg.quant_linear)(h.astype(cfg.dtype))
        h = nn.gelu(h, approximate=True)
        h = _dense(cfg.dim, ("ffn", "embed"), "ffn_out", cfg.dtype,
                   quant=cfg.quant_linear)(h)
        return (x + g2 * h).astype(cfg.residual_dtype)


class WanDiT(nn.Module):
    """Video DiT over VAE latents.

    __call__(latents [B, T, H, W, C_in], t [B], text_emb [B, L, text_dim],
             buffer_latents [B, T, H, W, buffer_channels] | None)
    -> velocity [B, T, H, W, C_out]

    ``sp_mesh``: concrete jax Mesh when cfg.sp_axis is set (self-attention
    runs as ring attention over that axis; shard token inputs accordingly).
    """
    cfg: WanDiTConfig
    sp_mesh: Any = None

    @nn.compact
    def __call__(self, latents, t, text_emb, buffer_latents=None):
        cfg = self.cfg
        B, T, H, W, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = T // pt, H // ph, W // pw
        N = gt * gh * gw

        def patchify(x, name, zero=False):
            x = x.reshape(B, gt, pt, gh, ph, gw, pw, x.shape[-1])
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, N, -1)
            return _dense(cfg.dim, ("patch", "embed"), name, cfg.dtype,
                          zero=zero)(x)

        x = patchify(latents, "patch_embed")
        if cfg.use_buffer_embedder and buffer_latents is not None:
            # zero-init: the pretrained T2V model is untouched at init
            # (reference initialize_buffer_embedder zero_init=True)
            x = x + patchify(buffer_latents, "buffer_embed", zero=True)

        # timestep embedding -> shared adaLN modulation
        from infinicube_tpu.models.diffusion.unet3d import timestep_embedding
        te = timestep_embedding(t, cfg.freq_dim)
        te = nn.Dense(cfg.dim, name="t_proj1")(te)
        te = nn.Dense(cfg.dim, name="t_proj2")(nn.silu(te))
        t_mod = nn.Dense(6 * cfg.dim, name="t_mod")(nn.silu(te))
        t_mod = t_mod.reshape(B, 6, cfg.dim)

        ctx = _dense(cfg.dim, ("embed_in", "embed"), "text_proj", cfg.dtype)(
            nn.gelu(_dense(cfg.dim, ("text", "embed"), "text_proj_in",
                           cfg.dtype)(text_emb.astype(cfg.dtype)),
                    approximate=True))

        angles = rope_3d((gt, gh, gw), cfg.dim // cfg.num_heads)
        if cfg.scan_layers:
            outer = self

            class _Body(nn.Module):
                cfg: WanDiTConfig

                @nn.compact
                def __call__(self, h, t_mod, ctx, ang):
                    return WanBlock(self.cfg,
                                    sp_mesh=outer.sp_mesh)(
                        h, t_mod, ctx, ang), None

            ScanBlock = nn.scan(
                _Body, variable_axes={"params": 0},
                split_rngs={"params": True}, length=cfg.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                metadata_params={nn.PARTITION_NAME: "layers"})
            # the scan carry dtype must be fixed: blocks cast their output
            # to cfg.residual_dtype (f32 for training; bf16 serving option)
            x, _ = ScanBlock(cfg, name="blocks")(
                x.astype(cfg.residual_dtype), t_mod, ctx, angles)
        else:
            for i in range(cfg.num_layers):
                x = WanBlock(cfg, sp_mesh=self.sp_mesh,
                             name=f"block{i}")(x, t_mod, ctx, angles)

        # final adaLN + unpatchify (zero-init head).  Wan's Head computes
        # shift, scale = (head.modulation + t_emb).chunk(2, dim=1) with the
        # RAW time embedding (no extra silu/Linear) — keep that exact math so
        # converted checkpoints modulate the output head correctly.
        head_mod = self.param("head_mod", nn.initializers.zeros,
                              (2, cfg.dim))
        fin = head_mod[None] + te[:, None, :].astype(jnp.float32)
        sh, sc = fin[:, 0][:, None, :], fin[:, 1][:, None, :]
        x = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=jnp.float32)(x) * (1 + sc) + sh
        out_dim = pt * ph * pw * cfg.out_channels
        x = _dense(out_dim, ("embed", "out"), "head", jnp.float32,
                   zero=True)(x.astype(jnp.float32))
        x = x.reshape(B, gt, gh, gw, pt, ph, pw, cfg.out_channels)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, T, H, W,
                                                        cfg.out_channels)
        return x
