"""Checkpoint-shaped SegFormer semantic segmenter (sky masks).

Mirror of the reference's mmseg SegFormer sky segmenter
(/root/reference/infinicube/voxelgen/data_process/
generate_additional_attributes.py:65 — cityscapes-pretrained SegFormer whose
'sky' class produces the GSM sky masks). Module structure and parameter
names follow HuggingFace ``SegformerForSemanticSegmentation`` exactly, so
released `nvidia/segformer-*-cityscapes-*` checkpoints convert mechanically
via ``convert_segformer_hf`` (numerics validated against the installed
transformers implementation in tests/test_segformer_parity.py).

MiT encoder: overlapped patch embeddings per stage; transformer blocks with
spatial-reduction attention (sr conv on kv) and Mix-FFN (dense -> 3x3
depthwise conv -> gelu -> dense); per-stage final LayerNorm. All-MLP decode
head: per-stage linear -> upsample to stage-0 resolution -> concat
(deepest first) -> 1x1 fuse -> BatchNorm (inference stats) -> ReLU ->
classifier."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CITYSCAPES_SKY_ID = 10


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    hidden_sizes: Sequence[int] = (32, 64, 160, 256)     # MiT-b0
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    decoder_hidden: int = 256
    num_labels: int = 19                                  # cityscapes
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def b0(**kw) -> "SegformerConfig":
        return SegformerConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "SegformerConfig":
        base = dict(hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                    num_heads=(1, 2, 3, 4), decoder_hidden=16)
        base.update(kw)
        return SegformerConfig(**base)


class EfficientAttention(nn.Module):
    """Self-attention with spatial-reduction on k/v (sr conv + LN)."""
    dim: int
    heads: int
    sr: int
    eps: float

    @nn.compact
    def __call__(self, x, hw):
        B, N, C = x.shape
        h, w = hw
        q = nn.Dense(C, name="query")(x)
        kv_in = x
        if self.sr > 1:
            sp = x.reshape(B, h, w, C)
            sp = nn.Conv(C, (self.sr, self.sr), strides=(self.sr, self.sr),
                         name="sr")(sp)
            kv_in = nn.LayerNorm(epsilon=self.eps, name="sr_norm")(
                sp.reshape(B, -1, C))
        k = nn.Dense(C, name="key")(kv_in)
        v = nn.Dense(C, name="value")(kv_in)
        hd = C // self.heads
        q = q.reshape(B, N, self.heads, hd)
        k = k.reshape(B, -1, self.heads, hd)
        v = v.reshape(B, -1, self.heads, hd)
        a = jnp.einsum("bqhc,bkhc->bhqk", q, k) / np.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", a, v).reshape(B, N, C)
        return nn.Dense(C, name="out")(out)


class MixFFN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, hw):
        B, N, C = x.shape
        h, w = hw
        x = nn.Dense(self.hidden, name="dense1")(x)
        sp = x.reshape(B, h, w, self.hidden)
        sp = nn.Conv(self.hidden, (3, 3), feature_group_count=self.hidden,
                     name="dwconv")(sp)
        x = nn.gelu(sp.reshape(B, N, self.hidden), approximate=False)
        return nn.Dense(self.dim, name="dense2")(x)


class SegformerBlock(nn.Module):
    cfg: SegformerConfig
    stage: int

    @nn.compact
    def __call__(self, x, hw):
        c = self.cfg
        d = c.hidden_sizes[self.stage]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        x = x + EfficientAttention(d, c.num_heads[self.stage],
                                   c.sr_ratios[self.stage], c.layer_norm_eps,
                                   name="attn")(h, hw)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        x = x + MixFFN(d, d * c.mlp_ratios[self.stage], name="mlp")(h, hw)
        return x


class Segformer(nn.Module):
    """pixels NHWC (imagenet-normalized) -> logits [B, H/4, W/4, labels]."""
    cfg: SegformerConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B = pixels.shape[0]
        x = pixels
        feats = []
        h, w = pixels.shape[1:3]
        for s in range(4):
            p, st = c.patch_sizes[s], c.strides[s]
            x = nn.Conv(c.hidden_sizes[s], (p, p), strides=(st, st),
                        padding=((p // 2, p // 2), (p // 2, p // 2)),
                        name=f"patch_embed{s}")(x)
            h, w = x.shape[1:3]
            x = x.reshape(B, h * w, c.hidden_sizes[s])
            x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name=f"patch_norm{s}")(x)
            for b in range(c.depths[s]):
                x = SegformerBlock(c, s, name=f"block{s}_{b}")(x, (h, w))
            x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name=f"stage_norm{s}")(x)
            x = x.reshape(B, h, w, c.hidden_sizes[s])
            feats.append(x)

        # all-MLP decode head at stage-0 resolution, deepest first
        th, tw = feats[0].shape[1:3]
        ups = []
        for s, f in enumerate(feats):
            f = nn.Dense(c.decoder_hidden, name=f"linear_c{s}")(f)
            if f.shape[1:3] != (th, tw):
                f = jax.image.resize(f, (B, th, tw, c.decoder_hidden),
                                     "bilinear")
            ups.append(f)
        fused = jnp.concatenate(ups[::-1], axis=-1)
        fused = nn.Conv(c.decoder_hidden, (1, 1), use_bias=False,
                        name="linear_fuse")(fused)
        mean = self.param("bn_mean", nn.initializers.zeros,
                          (c.decoder_hidden,))
        var = self.param("bn_var", nn.initializers.ones,
                         (c.decoder_hidden,))
        scale = self.param("bn_scale", nn.initializers.ones,
                           (c.decoder_hidden,))
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (c.decoder_hidden,))
        fused = (fused - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        fused = nn.relu(fused)
        return nn.Conv(c.num_labels, (1, 1), name="classifier")(fused)


def sky_mask_from_logits(logits: jnp.ndarray, hw: tuple[int, int],
                         sky_id: int = CITYSCAPES_SKY_ID) -> jnp.ndarray:
    """logits [B, H/4, W/4, L] -> uint8 sky mask [B, H, W] (1 = sky), the
    layout generate_additional_attributes writes to the skymask tars."""
    up = jax.image.resize(logits, logits.shape[:1] + hw + logits.shape[-1:],
                          "bilinear")
    return (jnp.argmax(up, axis=-1) == sky_id).astype(jnp.uint8)


def convert_segformer_hf(sd, cfg: SegformerConfig) -> dict:
    """HuggingFace SegformerForSemanticSegmentation state dict -> params."""
    t2j = lambda x: jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                           if hasattr(x, "detach") else x))

    def lin(p):
        return {"kernel": t2j(sd[f"{p}.weight"]).T,
                "bias": t2j(sd[f"{p}.bias"])}

    def ln(p):
        return {"scale": t2j(sd[f"{p}.weight"]), "bias": t2j(sd[f"{p}.bias"])}

    def conv(p, bias=True, dw=False):
        w = t2j(sd[f"{p}.weight"])
        # torch [O, I, kh, kw] -> flax [kh, kw, I, O]; depthwise [O,1,k,k]
        # -> flax grouped [k, k, 1, O]
        out = {"kernel": w.transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = t2j(sd[f"{p}.bias"])
        return out

    params = {}
    for s in range(4):
        params[f"patch_embed{s}"] = conv(
            f"segformer.encoder.patch_embeddings.{s}.proj")
        params[f"patch_norm{s}"] = ln(
            f"segformer.encoder.patch_embeddings.{s}.layer_norm")
        params[f"stage_norm{s}"] = ln(f"segformer.encoder.layer_norm.{s}")
        for b in range(cfg.depths[s]):
            p = f"segformer.encoder.block.{s}.{b}"
            attn = {"query": lin(f"{p}.attention.self.query"),
                    "key": lin(f"{p}.attention.self.key"),
                    "value": lin(f"{p}.attention.self.value"),
                    "out": lin(f"{p}.attention.output.dense")}
            if cfg.sr_ratios[s] > 1:
                attn["sr"] = conv(f"{p}.attention.self.sr")
                attn["sr_norm"] = ln(f"{p}.attention.self.layer_norm")
            params[f"block{s}_{b}"] = {
                "norm1": ln(f"{p}.layer_norm_1"),
                "attn": attn,
                "norm2": ln(f"{p}.layer_norm_2"),
                "mlp": {"dense1": lin(f"{p}.mlp.dense1"),
                        "dwconv": conv(f"{p}.mlp.dwconv.dwconv"),
                        "dense2": lin(f"{p}.mlp.dense2")},
            }
    for s in range(4):
        params[f"linear_c{s}"] = lin(f"decode_head.linear_c.{s}.proj")
    params["linear_fuse"] = conv("decode_head.linear_fuse", bias=False)
    params["bn_mean"] = t2j(sd["decode_head.batch_norm.running_mean"])
    params["bn_var"] = t2j(sd["decode_head.batch_norm.running_var"])
    params["bn_scale"] = t2j(sd["decode_head.batch_norm.weight"])
    params["bn_bias"] = t2j(sd["decode_head.batch_norm.bias"])
    params["classifier"] = conv("decode_head.classifier")
    return {"params": params}
