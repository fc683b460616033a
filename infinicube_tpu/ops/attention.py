"""Attention dispatch: Pallas TPU flash attention for long sequences, XLA
einsum elsewhere.

The Wan DiT self-attends over ~37k video tokens (93f @ 480p ->
24x30x52 = 37,440); materializing the N^2 logits would need ~67 GB, so on TPU
the memory-linear Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) is mandatory, not an
optimization. CPU/short-sequence paths use a plain einsum (numerically
equivalent, f32 softmax)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _einsum_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         flash_min_seq: int = 2048) -> jnp.ndarray:
    """q/k/v [B, N, heads, head_dim] -> [B, N, heads, head_dim].

    Uses the Pallas TPU flash kernel when running on TPU with sequences long
    enough to matter (and 128-aligned head_dim); falls back to einsum."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    nq, nk = q.shape[1], k.shape[1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and nq >= flash_min_seq:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)
            # tuned on v5e: 1024 blocks run ~8x faster than the defaults
            # (135 TF/s vs 17 TF/s at N=37k, hd=128); 2048 exceeds VMEM
            block = 1024
            pad_q = (-nq) % block
            blk_k = min(block, nk) if nk % min(block, nk) == 0 else block
            pad_k = (-nk) % blk_k
            # kernel layout: [B, heads, N, head_dim]
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if pad_q:
                qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
            if pad_k:
                kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
                vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
            if pad_q or pad_k:
                # padding tokens get a different segment id -> fully masked
                B = qt.shape[0]
                seg_q = jnp.concatenate(
                    [jnp.zeros((B, nq), jnp.int32),
                     jnp.ones((B, pad_q), jnp.int32)], axis=1)
                seg_k = jnp.concatenate(
                    [jnp.zeros((B, nk), jnp.int32),
                     jnp.ones((B, pad_k), jnp.int32)], axis=1)
                ids = SegmentIds(q=seg_q, kv=seg_k)
            else:
                ids = None
            bq = min(block, nq + pad_q)
            bk = min(blk_k, nk + pad_k)
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
                block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
                block_q_dq=bq)
            out = flash_attention(qt, kt, vt, segment_ids=ids, sm_scale=scale,
                                  block_sizes=bs)
            return out[:, :, :nq].transpose(0, 2, 1, 3)
        except Exception:
            pass
    return _einsum_attention(q, k, v, scale)
