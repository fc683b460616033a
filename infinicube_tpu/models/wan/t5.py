"""UMT5-style text encoder (the umt5-xxl conditioning path, SURVEY.md §2.1 N6).

Self-contained T5 encoder: relative position bias (per-layer, UMT5-style),
RMSNorm pre-norm, gated-GELU FFN. Weight conversion from a HuggingFace UMT5
checkpoint is a straight name mapping (weights/wan_convert.py); without
weights the module runs with random init for shape/perf work. Tokenization is
delegated to ``transformers`` when available (pipeline.py)."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384          # umt5 vocab
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64
    rel_pos_buckets: int = 32
    rel_pos_max_dist: int = 128
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny(**kw) -> "T5Config":
        base = dict(vocab_size=512, d_model=64, d_ff=128, num_layers=2,
                    num_heads=4, head_dim=16)
        base.update(kw)
        return T5Config(**base)


def relative_position_bucket(rel: jnp.ndarray, num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 bucket scheme."""
    nb = num_buckets // 2
    out = jnp.where(rel > 0, nb, 0)
    rel = jnp.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact) /
        jnp.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(rel < max_exact, rel, large)


class T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        B, L, _ = x.shape
        inner = cfg.num_heads * cfg.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="v")(x)
        q = q.reshape(B, L, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, L, cfg.num_heads, cfg.head_dim)
        v = v.reshape(B, L, cfg.num_heads, cfg.head_dim)
        pos = jnp.arange(L)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(rel, cfg.rel_pos_buckets,
                                           cfg.rel_pos_max_dist)
        bias_table = self.param("rel_bias", nn.initializers.normal(0.02),
                                (cfg.rel_pos_buckets, cfg.num_heads))
        bias = bias_table[buckets].transpose(2, 0, 1)          # [h, L, L]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits + bias[None]
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        h = nn.RMSNorm(dtype=jnp.float32, name="ln1")(x).astype(cfg.dtype)
        x = x + T5Attention(cfg, name="attn")(h, mask)
        h = nn.RMSNorm(dtype=jnp.float32, name="ln2")(x).astype(cfg.dtype)
        wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                       name="wi0")(h)
        wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                       name="wi1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                         name="wo")(h)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config = T5Config()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """tokens int32[B, L], mask bool[B, L] -> f32[B, L, d_model]."""
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")(tokens)
        x = x.astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"layer{i}")(x, mask)
        x = nn.RMSNorm(dtype=jnp.float32, name="final_ln")(x)
        return jnp.where(mask[..., None], x, 0.0)
