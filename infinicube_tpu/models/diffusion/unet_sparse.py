"""Sparse diffusion UNet variant (the fully-sparse denoiser).

Mirror of /root/reference/infinicube/voxelgen/modules/diffusionmodules/
openaimodel/unet_sparse.py:217-403 (+ the crossattn variant): the same
ResBlock/attention skeleton as the dense UNet but built from sparse
gather-GEMM convolutions on the capacity-padded grid, with per-sample masked
attention — used when the latent grid is NOT densified (non-release configs;
the release 64^3 latent uses unet3d.UNet3D)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import max_pool, neighbor_indexes, upsample_nearest
from infinicube_tpu.models.diffusion.unet3d import timestep_embedding
from infinicube_tpu.nn.sparse import (
    GroupNormSparse, SparseConv3d, conv_plan, sparse_attention)


@dataclasses.dataclass(frozen=True)
class SparseUNetConfig:
    out_channels: int = 8
    model_channels: int = 64
    channel_mult: Sequence[int] = (1, 2)
    num_res_blocks: int = 1
    attend_levels: Sequence[int] = (1,)
    num_heads: int = 4
    pooling_factor: tuple = (2, 2, 2)
    conv_backend: str = "auto"
    dtype: Any = jnp.float32


class SparseTimestepResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, emb, nbr, mask):
        h = nn.silu(GroupNormSparse()(feats, mask))
        h = SparseConv3d(self.features, dtype=self.dtype, name="conv1")(h, nbr)
        scale_shift = nn.Dense(2 * self.features, name="emb")(nn.silu(emb))
        scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
        h = GroupNormSparse(name="gn2")(h, mask) * (1 + scale) + shift
        h = nn.silu(h)
        h = SparseConv3d(self.features, dtype=self.dtype, name="conv2")(h, nbr)
        if feats.shape[-1] != self.features:
            feats = nn.Dense(self.features, name="skip")(feats)
        return jnp.where(mask[..., None], feats + h, 0.0)


class SparseAttentionBlock(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, feats, mask):
        F = feats.shape[-1]
        h = GroupNormSparse()(feats, mask)
        qkv = nn.Dense(3 * F, name="qkv")
        proj = nn.Dense(F, kernel_init=nn.initializers.zeros, name="proj")
        return sparse_attention(h, mask, self.num_heads, qkv, proj)


class SparseUNet(nn.Module):
    """Denoiser over (grid pyramid, per-voxel latents).

    __call__(grids [G0..G_L] (structure fixed during denoising), x [B, C0, F],
    t [B], context [B, L, D] | None) -> [B, C0, out_channels].
    """
    cfg: SparseUNetConfig = SparseUNetConfig()

    @nn.compact
    def __call__(self, grids: list[Grid], x: jnp.ndarray, t: jnp.ndarray,
                 context: jnp.ndarray | None = None):
        cfg = self.cfg
        ch = cfg.model_channels
        emb = timestep_embedding(t, ch)
        emb = nn.Dense(4 * ch)(nn.silu(nn.Dense(4 * ch)(emb)))

        L = len(cfg.channel_mult)
        assert len(grids) >= L
        h = nn.Dense(ch, name="in_proj")(x)
        skips = []
        for l, mult in enumerate(cfg.channel_mult):
            nbr = conv_plan(grids[l], cfg.conv_backend)
            for i in range(cfg.num_res_blocks):
                h = SparseTimestepResBlock(ch * mult, cfg.dtype,
                                           name=f"enc{l}_{i}")(
                    h, emb, nbr, grids[l].mask)
                if l in cfg.attend_levels:
                    h = SparseAttentionBlock(cfg.num_heads,
                                             name=f"enc_attn{l}_{i}")(
                        h, grids[l].mask)
            skips.append(h)
            if l < L - 1:
                _, h = max_pool(grids[l], h, cfg.pooling_factor,
                                coarse=grids[l + 1])

        nbr = conv_plan(grids[L - 1], cfg.conv_backend)
        h = SparseTimestepResBlock(h.shape[-1], cfg.dtype, name="mid1")(
            h, emb, nbr, grids[L - 1].mask)
        h = SparseAttentionBlock(cfg.num_heads, name="mid_attn")(
            h, grids[L - 1].mask)
        if context is not None:  # crossattn variant (unet_sparse_crossattn)
            F = h.shape[-1]
            q = nn.Dense(F, name="xq")(h)
            k = nn.Dense(F, name="xk")(context)
            v = nn.Dense(F, name="xv")(context)
            a = jnp.einsum("bcf,blf->bcl", q, k) / jnp.sqrt(F)
            a = jnp.where(grids[L - 1].mask[..., None], a, 0.0)
            h = h + nn.Dense(F, kernel_init=nn.initializers.zeros,
                             name="xo")(
                jnp.einsum("bcl,blf->bcf",
                           jnp.exp(a - jnp.max(a, -1, keepdims=True)) /
                           jnp.maximum(jnp.sum(jnp.exp(
                               a - jnp.max(a, -1, keepdims=True)), -1,
                               keepdims=True), 1e-6), v))
        h = SparseTimestepResBlock(h.shape[-1], cfg.dtype, name="mid2")(
            h, emb, nbr, grids[L - 1].mask)

        for l in range(L - 2, -1, -1):
            _, h = upsample_nearest(grids[l + 1], h, cfg.pooling_factor,
                                    fine=grids[l])
            h = jnp.concatenate([h, skips[l]], axis=-1)
            nbr = conv_plan(grids[l], cfg.conv_backend)
            h = SparseTimestepResBlock(ch * cfg.channel_mult[l], cfg.dtype,
                                       name=f"dec{l}")(
                h, emb, nbr, grids[l].mask)

        h = nn.silu(GroupNormSparse(name="out_gn")(h, grids[0].mask))
        out = nn.Dense(cfg.out_channels, kernel_init=nn.initializers.zeros,
                       name="out")(h)
        return jnp.where(grids[0].mask[..., None], out, 0.0)
