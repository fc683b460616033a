"""Checkpoint-shaped Depth-Anything-V2 feature tower (frozen GSM encoder).

Mirror of the reference's DAV2Encoder + vendored HF DepthAnything
(/root/reference/infinicube/voxelgen/modules/gsm_modules/encoder/modules/
dav2_encoder.py:36-121, depth_anything_v2_hf.py:67-581): a DINOv2 ViT
backbone taps 4 intermediate layers; the DPT neck reassembles them to
image-like maps (1x1 projection + per-level resize), 3x3-projects to the
fusion width, and runs the top-down feature-fusion stage; the encoder takes
the LAST fusion map (stride-8/patch resolution) through a small trainable
upsampler.

Module structure and parameter names follow the HuggingFace
``DepthAnythingForDepthEstimation`` layout exactly, so released
`depth-anything/Depth-Anything-V2-*-hf` checkpoints convert mechanically via
``convert_dav2_hf`` (validated against the installed transformers
implementation in tests/test_dav2_parity.py)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DAv2Config:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch: int = 14
    out_indices: Sequence[int] = (3, 6, 9, 12)   # 1-based encoder layers
    neck_hidden_sizes: Sequence[int] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    pos_tokens: int = (518 // 14) ** 2   # pretraining pos-embed grid
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def vits(**kw) -> "DAv2Config":
        return DAv2Config(**kw)

    @staticmethod
    def vitl(**kw) -> "DAv2Config":
        base = dict(hidden_size=1024, num_layers=24, num_heads=16,
                    out_indices=(5, 12, 18, 24),
                    neck_hidden_sizes=(256, 512, 1024, 1024),
                    fusion_hidden_size=256)
        base.update(kw)
        return DAv2Config(**base)

    @staticmethod
    def tiny(**kw) -> "DAv2Config":
        base = dict(hidden_size=32, num_layers=4, num_heads=2,
                    out_indices=(1, 2, 3, 4), pos_tokens=(70 // 14) ** 2,
                    neck_hidden_sizes=(8, 12, 16, 16), fusion_hidden_size=16)
        base.update(kw)
        return DAv2Config(**base)


def _resize_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch interpolate in the DPT
    fusion upsample) on NHWC."""
    B, H, W, C = x.shape
    oh, ow = size

    def coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,))
        return jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))

    ys, xs = coords(H, oh), coords(W, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    return (g(y0, x0) * (1 - fy) * (1 - fx) + g(y0, x1) * (1 - fy) * fx +
            g(y1, x0) * fy * (1 - fx) + g(y1, x1) * fy * fx)


class Dinov2Layer(nn.Module):
    cfg: DAv2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=cfg.dtype, name="attention")(h, h)
        ls1 = self.param("layer_scale1", nn.initializers.ones,
                         (cfg.hidden_size,))
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(cfg.mlp_ratio * cfg.hidden_size, dtype=cfg.dtype,
                     name="fc1")(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     name="fc2")(nn.gelu(h, approximate=False))
        ls2 = self.param("layer_scale2", nn.initializers.ones,
                         (cfg.hidden_size,))
        return x + h * ls2


class Dinov2Backbone(nn.Module):
    """Patch embed + cls/pos tokens + encoder; returns the layer-normed
    hidden states at cfg.out_indices (HF Dinov2Backbone semantics:
    apply_layernorm=True, cls token kept)."""
    cfg: DAv2Config

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = self.cfg
        B, H, W, _ = pixels.shape
        p = cfg.patch
        ph, pw = H // p, W // p
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), dtype=cfg.dtype,
                    name="patch_embed")(pixels)
        x = x.reshape(B, ph * pw, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, 1 + cfg.pos_tokens, cfg.hidden_size))
        n_ref = pos.shape[1] - 1
        if n_ref != ph * pw:
            side = int(round(np.sqrt(n_ref)))
            grid = pos[:, 1:].reshape(1, side, side, cfg.hidden_size)
            grid = jax.image.resize(grid, (1, ph, pw, cfg.hidden_size),
                                    "bicubic")
            pos_use = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, ph * pw, cfg.hidden_size)], 1)
        else:
            pos_use = pos
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)),
                             x], axis=1) + pos_use
        taps = []
        want = set(cfg.out_indices)
        for i in range(cfg.num_layers):
            x = Dinov2Layer(cfg, name=f"layer{i}")(x)
            if (i + 1) in want:
                taps.append(x)
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")
        return [ln(t) for t in taps]


class ReassembleLayer(nn.Module):
    cfg: DAv2Config
    channels: int
    factor: float

    @nn.compact
    def __call__(self, x):  # [B, h, w, hidden]
        x = nn.Conv(self.channels, (1, 1), name="projection")(x)
        f = self.factor
        if f > 1:
            f = int(f)
            x = nn.ConvTranspose(self.channels, (f, f), strides=(f, f),
                                 padding="VALID", name="resize")(x)
        elif f < 1:
            s = int(round(1 / f))
            x = nn.Conv(self.channels, (3, 3), strides=(s, s),
                        padding=((1, 1), (1, 1)), name="resize")(x)
        return x


class PreActResidual(nn.Module):
    cfg: DAv2Config

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.cfg.fusion_hidden_size, (3, 3),
                    name="convolution1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.cfg.fusion_hidden_size, (3, 3),
                    name="convolution2")(h)
        return x + h


class FeatureFusionLayer(nn.Module):
    cfg: DAv2Config

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        if residual is not None:
            if x.shape != residual.shape:
                residual = jax.image.resize(residual, x.shape, "bilinear")
            x = x + PreActResidual(self.cfg, name="residual_layer1")(residual)
        x = PreActResidual(self.cfg, name="residual_layer2")(x)
        out_size = size if size is not None else (x.shape[1] * 2,
                                                  x.shape[2] * 2)
        x = _resize_align_corners(x, out_size)
        return nn.Conv(self.cfg.fusion_hidden_size, (1, 1),
                       name="projection")(x)


class DepthAnythingFeatures(nn.Module):
    """pixel_values NHWC (imagenet-normalized) -> list of 4 fusion maps,
    the last at (patch_h*8, patch_w*8) resolution (forward_fusion)."""
    cfg: DAv2Config

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = self.cfg
        B, H, W, _ = pixels.shape
        ph, pw = H // cfg.patch, W // cfg.patch
        taps = Dinov2Backbone(cfg, name="backbone")(pixels)
        feats = []
        for i, t in enumerate(taps):
            t = t[:, 1:].reshape(B, ph, pw, cfg.hidden_size)
            t = ReassembleLayer(cfg, cfg.neck_hidden_sizes[i],
                                cfg.reassemble_factors[i],
                                name=f"reassemble{i}")(t)
            t = nn.Conv(cfg.fusion_hidden_size, (3, 3), use_bias=False,
                        name=f"neck_conv{i}")(t)
            feats.append(t)
        # top-down fusion (deepest first)
        feats = feats[::-1]
        fused = []
        size = feats[1].shape[1:3]
        h = FeatureFusionLayer(cfg, name="fusion0")(feats[0], size=size)
        fused.append(h)
        for idx, skip in enumerate(feats[1:]):
            size = feats[1:][idx + 1].shape[1:3] \
                if idx != len(feats) - 2 else None
            h = FeatureFusionLayer(cfg, name=f"fusion{idx + 1}")(
                h, skip, size=size)
            fused.append(h)
        return fused


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def convert_dinov2_hf(sd, cfg: DAv2Config) -> dict:
    """HuggingFace ``Dinov2Model`` state dict -> Dinov2Backbone params (the
    standalone DINOv2 GSM-encoder option; same backbone module DAv2
    embeds, different checkpoint prefix — no 'backbone.' and the DAv2 DPT
    neck is absent). Validated against the installed transformers
    Dinov2Model in tests/test_encoder_towers.py."""
    t2j = lambda x: jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                           if hasattr(x, "detach") else x))

    def lin(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).T,
                "bias": t2j(sd[f"{prefix}.bias"])}

    def lnorm(prefix):
        return {"scale": t2j(sd[f"{prefix}.weight"]),
                "bias": t2j(sd[f"{prefix}.bias"])}

    hd = cfg.hidden_size // cfg.num_heads

    def attn(prefix):
        def head_split(name):
            k = t2j(sd[f"{prefix}.attention.{name}.weight"]).T
            b = t2j(sd[f"{prefix}.attention.{name}.bias"])
            return {"kernel": k.reshape(cfg.hidden_size, cfg.num_heads, hd),
                    "bias": b.reshape(cfg.num_heads, hd)}
        o = t2j(sd[f"{prefix}.output.dense.weight"]).T
        return {"query": head_split("query"), "key": head_split("key"),
                "value": head_split("value"),
                "out": {"kernel": o.reshape(cfg.num_heads, hd,
                                            cfg.hidden_size),
                        "bias": t2j(sd[f"{prefix}.output.dense.bias"])}}

    params = {
        "patch_embed": {
            "kernel": t2j(sd["embeddings.patch_embeddings.projection"
                             ".weight"]).transpose(2, 3, 1, 0),
            "bias": t2j(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": t2j(sd["embeddings.cls_token"]),
        "position_embeddings": t2j(sd["embeddings.position_embeddings"]),
        "layernorm": lnorm("layernorm"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "norm1": lnorm(f"{p}.norm1"),
            "attention": attn(f"{p}.attention"),
            "layer_scale1": t2j(sd[f"{p}.layer_scale1.lambda1"]),
            "norm2": lnorm(f"{p}.norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
            "layer_scale2": t2j(sd[f"{p}.layer_scale2.lambda1"]),
        }
    return {"params": params}


def convert_dav2_hf(sd, cfg: DAv2Config) -> dict:
    """HuggingFace DepthAnythingForDepthEstimation state dict ->
    DepthAnythingFeatures params."""
    t2j = lambda x: jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                           if hasattr(x, "detach") else x))

    def lin(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).T,
                "bias": t2j(sd[f"{prefix}.bias"])}

    def lnorm(prefix):
        return {"scale": t2j(sd[f"{prefix}.weight"]),
                "bias": t2j(sd[f"{prefix}.bias"])}

    def conv(prefix, bias=True):
        out = {"kernel": t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = t2j(sd[f"{prefix}.bias"])
        return out

    def convT(prefix):
        # torch ConvTranspose2d weight [in, out, kh, kw] -> flax [kh, kw, in,
        # out]; flax ConvTranspose does NOT flip the kernel while torch's is
        # the conv gradient, so flip the spatial dims (measured exact)
        w = np.asarray(sd[f"{prefix}.weight"].detach().cpu().numpy()
                       if hasattr(sd[f"{prefix}.weight"], "detach")
                       else sd[f"{prefix}.weight"])
        w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        return {"kernel": jnp.asarray(w.copy()),
                "bias": t2j(sd[f"{prefix}.bias"])}

    hd = cfg.hidden_size // cfg.num_heads

    def attn(prefix):
        def head_split(name):
            k = t2j(sd[f"{prefix}.attention.{name}.weight"]).T
            b = t2j(sd[f"{prefix}.attention.{name}.bias"])
            return {"kernel": k.reshape(cfg.hidden_size, cfg.num_heads, hd),
                    "bias": b.reshape(cfg.num_heads, hd)}
        o = t2j(sd[f"{prefix}.output.dense.weight"]).T
        return {"query": head_split("query"), "key": head_split("key"),
                "value": head_split("value"),
                "out": {"kernel": o.reshape(cfg.num_heads, hd,
                                            cfg.hidden_size),
                        "bias": t2j(sd[f"{prefix}.output.dense.bias"])}}

    backbone = {
        "patch_embed": conv("backbone.embeddings.patch_embeddings.projection"),
        "cls_token": t2j(sd["backbone.embeddings.cls_token"]),
        "position_embeddings": t2j(sd["backbone.embeddings"
                                      ".position_embeddings"]),
        "layernorm": lnorm("backbone.layernorm"),
    }
    for i in range(cfg.num_layers):
        p = f"backbone.encoder.layer.{i}"
        backbone[f"layer{i}"] = {
            "norm1": lnorm(f"{p}.norm1"),
            "attention": attn(f"{p}.attention"),
            "layer_scale1": t2j(sd[f"{p}.layer_scale1.lambda1"]),
            "norm2": lnorm(f"{p}.norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
            "layer_scale2": t2j(sd[f"{p}.layer_scale2.lambda1"]),
        }

    params = {"backbone": backbone}
    for i, factor in enumerate(cfg.reassemble_factors):
        r = {"projection": conv(f"neck.reassemble_stage.layers.{i}"
                                ".projection")}
        if factor > 1:
            r["resize"] = convT(f"neck.reassemble_stage.layers.{i}.resize")
        elif factor < 1:
            r["resize"] = conv(f"neck.reassemble_stage.layers.{i}.resize")
        params[f"reassemble{i}"] = r
        params[f"neck_conv{i}"] = conv(f"neck.convs.{i}", bias=False)
    for i in range(len(cfg.neck_hidden_sizes)):
        p = f"neck.fusion_stage.layers.{i}"
        params[f"fusion{i}"] = {
            "projection": conv(f"{p}.projection"),
            "residual_layer1": {
                "convolution1": conv(f"{p}.residual_layer1.convolution1"),
                "convolution2": conv(f"{p}.residual_layer1.convolution2")},
            "residual_layer2": {
                "convolution1": conv(f"{p}.residual_layer2.convolution1"),
                "convolution2": conv(f"{p}.residual_layer2.convolution2")},
        }
    return {"params": params}
