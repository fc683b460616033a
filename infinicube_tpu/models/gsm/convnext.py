"""Checkpoint-shaped ConvNeXt feature tower (GSM encoder option).

Mirror of the reference UnifiedEncoder's convnext image-encoder option
(/root/reference/infinicube/voxelgen/modules/gsm_modules/encoder/
unified_encoder.py ModuleDict): a frozen ConvNeXt backbone whose last-stage
features feed a trainable refiner. Parameter names/shapes follow the
HuggingFace ``ConvNextModel`` layout so released checkpoints convert
(``convert_convnext_hf``); numerics are validated against the INSTALLED
transformers class in tests/test_encoder_towers.py (the repo's converter
pattern, CLAUDE.md)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConvNextConfig:
    depths: Sequence[int] = (3, 3, 9, 3)
    hidden_sizes: Sequence[int] = (96, 192, 384, 768)   # convnext-tiny
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "ConvNextConfig":
        base = dict(depths=(1, 1, 2, 1), hidden_sizes=(8, 12, 16, 24))
        base.update(kw)
        return ConvNextConfig(**base)


class ConvNextBlock(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=self.eps, name="layernorm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     name="pwconv2")(nn.gelu(h, approximate=False))
        ls = self.param("layer_scale", nn.initializers.ones, (self.dim,))
        return x + h * ls


class ConvNextTower(nn.Module):
    """Embeddings + 4 stages; returns the LAST stage feature map
    [B, H/32, W/32, C_last] (HF last_hidden_state, channels-last)."""
    cfg: ConvNextConfig = ConvNextConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(cfg.hidden_sizes[0], (4, 4), strides=(4, 4),
                    dtype=cfg.dtype, name="patch_embed")(pixels)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embed_ln")(x)
        for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.hidden_sizes)):
            if s > 0:
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name=f"down_ln{s}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                            name=f"down_conv{s}")(x)
            for i in range(depth):
                x = ConvNextBlock(dim, cfg.layer_norm_eps, cfg.dtype,
                                  name=f"stage{s}_block{i}")(x)
        return x


class ConvNextFeatureEncoder(nn.Module):
    """Frozen ConvNeXt tower (stop-gradient) + trainable conv refiner,
    resized back to the pixel grid — the same frozen-tower/trainable-neck
    shape as the DAv2 encoder option."""
    width: int = 64
    cfg: ConvNextConfig = ConvNextConfig()

    @nn.compact
    def __call__(self, images):  # [B, H, W, 3] in [0, 1]
        B, H, W, _ = images.shape
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (images - mean) / std
        f = ConvNextTower(self.cfg, name="tower")(x)
        f = jax.lax.stop_gradient(f)
        h = nn.Conv(self.width, (3, 3), name="up0")(f)
        r = nn.relu(nn.Conv(self.width, (3, 3), name="up1")(nn.relu(h)))
        h = h + nn.Conv(self.width, (3, 3), name="up2")(r)
        return jax.image.resize(h, (B, H, W, self.width), "bilinear")


def convert_convnext_hf(sd, cfg: ConvNextConfig) -> dict:
    """HuggingFace ConvNextModel state dict -> ConvNextTower params."""
    t2j = lambda x: jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                           if hasattr(x, "detach") else x))

    def conv(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
                "bias": t2j(sd[f"{prefix}.bias"])}

    def lin(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).T,
                "bias": t2j(sd[f"{prefix}.bias"])}

    def lnorm(prefix):
        return {"scale": t2j(sd[f"{prefix}.weight"]),
                "bias": t2j(sd[f"{prefix}.bias"])}

    params = {
        "patch_embed": conv("embeddings.patch_embeddings"),
        "embed_ln": lnorm("embeddings.layernorm"),
    }
    for s, depth in enumerate(cfg.depths):
        if s > 0:
            p = f"encoder.stages.{s}.downsampling_layer"
            params[f"down_ln{s}"] = lnorm(f"{p}.0")
            params[f"down_conv{s}"] = conv(f"{p}.1")
        for i in range(depth):
            p = f"encoder.stages.{s}.layers.{i}"
            params[f"stage{s}_block{i}"] = {
                "dwconv": conv(f"{p}.dwconv"),
                "layernorm": lnorm(f"{p}.layernorm"),
                "pwconv1": lin(f"{p}.pwconv1"),
                "pwconv2": lin(f"{p}.pwconv2"),
                "layer_scale": t2j(sd[f"{p}.layer_scale_parameter"]),
            }
    return {"params": params}
