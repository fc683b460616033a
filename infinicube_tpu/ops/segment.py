"""Segment reduction wrappers (torch_scatter equivalents, SURVEY.md §2.1 N4).

Thin conveniences over jnp scatter; used by voxelization, the map encoder and
the GSM lifter in place of scatter_sum/scatter_max/scatter_mean."""

from __future__ import annotations

import jax.numpy as jnp


def segment_sum(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int):
    """values [N, F], idx int32[N] (negative = drop) -> [num_segments, F]."""
    safe = jnp.where(idx >= 0, idx, num_segments)
    out = jnp.zeros((num_segments,) + values.shape[1:], values.dtype)
    return out.at[safe].add(jnp.where((idx >= 0).reshape((-1,) + (1,) * (values.ndim - 1)),
                                      values, 0), mode="drop")


def segment_mean(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int):
    s = segment_sum(values, idx, num_segments)
    cnt = segment_sum(jnp.ones((values.shape[0], 1), jnp.float32), idx, num_segments)
    return s / jnp.maximum(cnt, 1.0)


def segment_max(values: jnp.ndarray, idx: jnp.ndarray, num_segments: int,
                fill=0.0):
    safe = jnp.where(idx >= 0, idx, num_segments)
    neg = jnp.full((num_segments,) + values.shape[1:], -jnp.inf, jnp.float32)
    out = neg.at[safe].max(
        jnp.where((idx >= 0).reshape((-1,) + (1,) * (values.ndim - 1)),
                  values.astype(jnp.float32), -jnp.inf), mode="drop")
    return jnp.where(jnp.isfinite(out), out, fill).astype(values.dtype)
