"""Dense 3D UNet denoiser for the voxel latent diffusion model.

Capability mirror of the reference's ADM-style dense UNet
(/root/reference/infinicube/voxelgen/modules/diffusionmodules/openaimodel/
unet_dense.py:375-757 + attention_dense.py) with the release hyper-parameters
(configs/diffusion_64x64x64_dense_vs02_map_cond.yaml:56-67: ch 192, mult
[1,2,4,4], attention at downsample factors 4/8, scale-shift GroupNorm, a
transformer stack of depth 12 in the middle block), re-designed for TPU:

- channels-last NDHWC layout (XLA's preferred conv layout on TPU),
- bf16 activation dtype with f32 params and f32 attention softmax,
- attention as plain batched einsum (XLA fuses into MXU flash-style schedules
  at these sizes: 16^3=4096 tokens max),
- no NCDHW<->sparse conversions inside the model; the wrapper moves data.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.ops.dense_conv import Conv3x3x3


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding. t int/float[B] -> f32[B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in f32 regardless of activation dtype."""
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        g = math.gcd(min(self.num_groups, x.shape[-1]), x.shape[-1])
        x = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32)(
            x.astype(jnp.float32))
        return x.astype(orig)


class ResBlock3D(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32
    use_scale_shift_norm: bool = True
    dropout: float = 0.0
    conv_impl: str = "auto"   # Pallas implicit-GEMM 3x3x3 on TPU (same
    # param tree as nn.Conv; ops/dense_conv.py — the conv wall measured
    # in docs/PERF.md's DDIM row)
    conv_quant: bool = False  # int8 MXU conv serving path

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = nn.silu(GroupNorm32()(x))
        h = Conv3x3x3(self.out_ch, dtype=self.dtype, impl=self.conv_impl,
                      quant=self.conv_quant, name="conv1")(h)
        e = nn.Dense(2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
                     dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        e = e[:, None, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = GroupNorm32()(h + e)
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv3x3x3(self.out_ch, dtype=self.dtype, impl=self.conv_impl,
                      quant=self.conv_quant,
                      kernel_init=nn.initializers.zeros, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class SelfAttention3D(nn.Module):
    """Spatial self-attention over flattened voxels (ADM AttentionBlock)."""
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        h = GroupNorm32()(x).reshape(B, -1, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, -1, 3, self.num_heads,
                                        C // self.num_heads), 3, axis=2)
        q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
        # memory-linear dispatch: the ds=4 blocks run 4096 tokens at C=768
        # and the materialized [B, 8, 4096, 4096] f32 logits are 537 MB of
        # HBM traffic per block — the flash kernel keeps them in VMEM
        from infinicube_tpu.ops.attention import multi_head_attention
        out = multi_head_attention(q, k, v).reshape(B, -1, C)
        out = nn.Dense(C, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(B, D, H, W, C)


class TransformerBlock(nn.Module):
    """Pre-LN self-attn [+ optional cross-attn] + GEGLU MLP
    (reference attention_dense.BasicTransformerBlock)."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, N, C = x.shape
        hd = C // self.num_heads

        def mha(q_in, kv_in, name):
            q = nn.Dense(C, dtype=self.dtype, name=f"{name}_q")(q_in)
            k = nn.Dense(C, dtype=self.dtype, name=f"{name}_k")(kv_in)
            v = nn.Dense(C, dtype=self.dtype, name=f"{name}_v")(kv_in)
            q = q.reshape(B, -1, self.num_heads, hd)
            k = k.reshape(B, -1, self.num_heads, hd)
            v = v.reshape(B, -1, self.num_heads, hd)
            a = jnp.einsum("bqhc,bkhc->bhqk", q, k).astype(jnp.float32)
            a = jax.nn.softmax(a / math.sqrt(hd), axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhc->bqhc", a, v).reshape(B, -1, C)
            return nn.Dense(C, dtype=self.dtype, name=f"{name}_o")(o)

        x = x + mha(nn.LayerNorm(dtype=self.dtype)(x),
                    nn.LayerNorm(dtype=self.dtype)(x), "self")
        if context is not None:
            x = x + mha(nn.LayerNorm(dtype=self.dtype)(x), context, "cross")
        h = nn.LayerNorm(dtype=self.dtype)(x)
        a, b = jnp.split(nn.Dense(8 * C, dtype=self.dtype, name="geglu")(h),
                         2, axis=-1)
        h = a * nn.gelu(b)
        x = x + nn.Dense(C, dtype=self.dtype, name="mlp_out")(h)
        return x


class SpatialTransformer3D(nn.Module):
    depth: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    scan_blocks: bool = True   # nn.scan the identical blocks (compile time)

    @nn.compact
    def __call__(self, x, context=None):
        B, D, H, W, C = x.shape
        h = GroupNorm32()(x).reshape(B, -1, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        if self.scan_blocks and self.depth > 1 and context is None:
            class _Body(nn.Module):
                num_heads: int
                dtype: jnp.dtype

                @nn.compact
                def __call__(self, z):
                    return TransformerBlock(self.num_heads,
                                            self.dtype)(z, None), None

            Scan = nn.scan(_Body, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=self.depth,
                           metadata_params={nn.PARTITION_NAME: "layers"})
            h, _ = Scan(self.num_heads, self.dtype, name="blocks")(
                h.astype(self.dtype))
        else:
            for i in range(self.depth):
                h = TransformerBlock(self.num_heads, self.dtype,
                                     name=f"block{i}")(h, context)
        h = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="proj_out")(h)
        return x + h.reshape(B, D, H, W, C)


class UNet3D(nn.Module):
    """Dense voxel UNet. Input/output NDHWC.

    Release config: in 16ch (8 latent + 3 pos + 3 map + 2 box), out 8ch,
    model_channels 192, channel_mult (1,2,4,4), attention_ds (4,8),
    middle transformer depth 12, heads 8.
    """
    out_channels: int = 8
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (4, 8)
    num_heads: int = 8
    transformer_depth: int = 12
    context_dim: int | None = None
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    remat: bool = False   # rematerialize res/transformer blocks (training
    # memory <-> recompute trade, jax.checkpoint)
    conv_impl: str = "auto"   # "auto": Pallas 3x3x3 conv on TPU where the
    # shape fits (ops/dense_conv.py), XLA elsewhere; "xla" forces XLA
    conv_quant: bool = False  # int8 MXU convs (serving; quality-gated in
    # tests/test_quant.py — gradients keep the full-precision kernel)

    @nn.compact
    def __call__(self, x, t, context=None, y_emb=None,
                 deterministic: bool = True):
        """y_emb: optional f32[B, E] adm conditioning vector (class embedding
        / pooled condition, reference num_classes path) added to the
        timestep embedding."""
        ResBlock = nn.remat(ResBlock3D) if self.remat else ResBlock3D
        Transformer = nn.remat(SpatialTransformer3D) if self.remat \
            else SpatialTransformer3D
        ch = self.model_channels
        emb = timestep_embedding(t, ch)
        emb = nn.Dense(4 * ch, dtype=self.dtype)(emb)
        emb = nn.Dense(4 * ch, dtype=self.dtype)(nn.silu(emb))
        if y_emb is not None:
            emb = emb + nn.Dense(4 * ch, dtype=self.dtype,
                                 name="y_proj")(y_emb)

        x = x.astype(self.dtype)
        h = Conv3x3x3(ch, dtype=self.dtype, impl=self.conv_impl,
                      quant=self.conv_quant, name="in_conv")(x)
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * ch, self.dtype, dropout=self.dropout,
                             conv_impl=self.conv_impl,
                             conv_quant=self.conv_quant)(
                    h, emb, deterministic)
                if ds in self.attention_ds:
                    h = SelfAttention3D(self.num_heads, self.dtype)(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3, 3), strides=(2, 2, 2),
                            dtype=self.dtype, name=f"down{level}")(h)
                ds *= 2
                skips.append(h)

        h = ResBlock(h.shape[-1], self.dtype, dropout=self.dropout,
                     conv_impl=self.conv_impl,
                     conv_quant=self.conv_quant)(h, emb, deterministic)
        h = Transformer(self.transformer_depth, self.num_heads,
                        self.dtype, name="middle_transformer")(h, context)
        h = ResBlock(h.shape[-1], self.dtype, dropout=self.dropout,
                     conv_impl=self.conv_impl,
                     conv_quant=self.conv_quant)(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(mult * ch, self.dtype, dropout=self.dropout,
                             conv_impl=self.conv_impl,
                             conv_quant=self.conv_quant)(
                    h, emb, deterministic)
                if ds in self.attention_ds:
                    h = SelfAttention3D(self.num_heads, self.dtype)(h)
            if level != 0:
                B, D, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * D, 2 * H, 2 * W, C), "nearest")
                h = Conv3x3x3(C, dtype=self.dtype, impl=self.conv_impl,
                              quant=self.conv_quant, name=f"up{level}")(h)
                ds //= 2

        h = nn.silu(GroupNorm32()(h))
        h = nn.Conv(self.out_channels, (3, 3, 3), dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        return h.astype(jnp.float32)
