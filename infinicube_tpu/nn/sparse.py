"""Sparse-voxel neural network layers (fvdb.nn replacement, SURVEY.md §2.5).

The fvnn layer set the reference's VAE/GSM UNets are built from —
SparseConv3d, GroupNorm, Linear, MaxPool, UpsamplingNearest, activations —
re-designed for the capacity-padded grid core:

- **SparseConv3d** dispatches on its plan argument (``conv_plan`` builds
  one per grid): the Pallas **window-GEMM** (ops/window_conv.py — the TPU
  fast path, 5-50x the alternatives), the **gather-GEMM** reference
  formulation (27 neighbor-table gathers + MXU matmuls under ``lax.scan`` —
  the CPU/testing default; XLA row gathers cap it at ~1 TF/s on TPU), or
  the **brick-dense** backend (nn/brick.py). All share one parameter
  layout, so checkpoints and the choice of backend are independent.
  Padding slots carry zeros so absent neighbors contribute nothing —
  matching fvdb's implicit zero outside the grid.
- **GroupNormSparse** computes masked per-sample statistics over active
  voxels only (fvnn.GroupNorm semantics on JaggedTensor).
- Pooling/upsampling data movement lives in ``grid.ops`` (max_pool /
  upsample_nearest with optional structure masks).
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.brick import (
    BrickPlan, brick_conv_taps, brick_conv_xla, from_bricks, halo_pad,
    to_bricks)


def gather_neighbor_features(feats: jnp.ndarray, nbr: jnp.ndarray,
                             tap: int) -> jnp.ndarray:
    """feats [B, C, F], nbr int32[B, C, K] -> tap features [B, C, F]
    (zeros where the neighbor is absent)."""
    idx = nbr[:, :, tap]
    got = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(feats, idx)
    return jnp.where((idx >= 0)[..., None], got, 0.0)


class SparseConv3d(nn.Module):
    """Sparse 3x3x3 convolution on a fixed grid (stride 1), three backends
    dispatched on the plan type (build with ``conv_plan``):

    - ``WindowPlan`` (``ops.window_conv``): Pallas window-GEMM — the TPU
      fast path (4.9/17.3/50.9 TF/s at F=64/128/256 on v5e).
    - int32[B, C, K] neighbor table (``neighbor_indexes``): gather-GEMM —
      27 row-gathers + matmuls; simple, XLA-gather bound (~1 TF/s on TPU),
      the CPU/testing default.
    - ``BrickPlan`` (``nn.brick.build_brick_plan``): brick-dense halos +
      dense MXU math; ``brick_resident=True`` keeps feats brick-dense
      between the two convs of SparseResBlock.

    Parameters are identical across backends (kernel [K, F_in, F_out] in
    neighbor_offsets tap order), so checkpoints are interchangeable."""
    features: int
    kernel_volume: int = 27
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    brick_impl: str = "taps"

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan,
                 brick_resident: bool = False) -> jnp.ndarray:
        K = self.kernel_volume
        F_in = feats.shape[-1]
        scale = 1.0 / math.sqrt(K * F_in)
        w = self.param("kernel", nn.initializers.uniform(scale),
                       (K, F_in, self.features))
        feats = feats.astype(self.dtype)
        w = w.astype(self.dtype)

        from infinicube_tpu.ops.window_conv import (
            WindowPlan, window_sparse_conv)
        if isinstance(plan, WindowPlan):
            out = window_sparse_conv(plan, feats, w)
        elif isinstance(plan, BrickPlan):
            conv = brick_conv_xla if self.brick_impl == "xla" \
                else brick_conv_taps
            bricks = feats if brick_resident else to_bricks(plan, feats)
            out = conv(halo_pad(plan, bricks), w)
            if not brick_resident:
                out = from_bricks(plan, out)
        else:
            def body(acc, k):
                tap = gather_neighbor_features(feats, plan, k)
                return acc + jnp.einsum("bcf,fo->bco", tap, w[k]), None

            acc0 = jnp.zeros(feats.shape[:2] + (self.features,), self.dtype)
            out, _ = jax.lax.scan(body, acc0, jnp.arange(K))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,)).astype(self.dtype)
        if isinstance(plan, BrickPlan) and brick_resident:
            # keep empty slots exactly zero (submanifold: absent voxels must
            # contribute nothing to later taps)
            out = jnp.where(plan.dense_mask[..., None], out, 0.0)
        return out


class GroupNormSparse(nn.Module):
    """Masked GroupNorm over active voxels (per sample, per group)."""
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, C, F = feats.shape
        g = math.gcd(min(self.num_groups, F), F)
        x = feats.astype(jnp.float32).reshape(B, C, g, F // g)
        m = mask[:, :, None, None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=(1, 3), keepdims=True) * (F // g), 1.0)
        mean = jnp.sum(x * m, axis=(1, 3), keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 3), keepdims=True) / n
        x = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        x = x.reshape(B, C, F)
        scale = self.param("scale", nn.initializers.ones, (F,))
        bias = self.param("bias", nn.initializers.zeros, (F,))
        out = x * scale + bias
        return jnp.where(mask[..., None], out, 0.0).astype(feats.dtype)


class SparseResBlock(nn.Module):
    """GroupNorm -> SiLU -> SparseConv x2 with skip (the reference's
    ConvBlock order-string "gcs" / SparseResBlock, sunet.py:43-207)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, plan, mask):
        if isinstance(plan, BrickPlan):
            # brick-resident: convert once, keep everything on dense slots
            # (GroupNorm/Dense over dense slots with the dense-occupancy mask
            # are exactly the masked voxel-row ops on the same active set)
            dm = plan.dense_mask
            xb = to_bricks(plan, feats)
            h = nn.silu(GroupNormSparse()(xb, dm))
            h = SparseConv3d(self.features, dtype=self.dtype,
                             name="conv1")(h, plan, brick_resident=True)
            h = nn.silu(GroupNormSparse()(h, dm))
            h = SparseConv3d(self.features, dtype=self.dtype,
                             name="conv2")(h, plan, brick_resident=True)
            if feats.shape[-1] != self.features:
                xb = nn.Dense(self.features, dtype=self.dtype,
                              name="skip")(xb)
            out = from_bricks(plan, xb + h)
            return jnp.where(mask[..., None], out, 0.0)
        h = nn.silu(GroupNormSparse()(feats, mask))
        h = SparseConv3d(self.features, dtype=self.dtype, name="conv1")(h, plan)
        h = nn.silu(GroupNormSparse()(h, mask))
        h = SparseConv3d(self.features, dtype=self.dtype, name="conv2")(h, plan)
        if feats.shape[-1] != self.features:
            feats = nn.Dense(self.features, dtype=self.dtype,
                             name="skip")(feats)
        out = feats + h
        return jnp.where(mask[..., None], out, 0.0)


def sparse_attention(feats: jnp.ndarray, mask: jnp.ndarray, num_heads: int,
                     qkv: Callable, proj: Callable) -> jnp.ndarray:
    """Masked per-sample full self-attention over active voxels (the
    reference's per-batch flash AttentionBlock, sunet.py:210-266).

    qkv/proj are Dense applications supplied by the caller (so parameters
    live in the calling module)."""
    B, C, F = feats.shape
    h = qkv(feats)                       # [B, C, 3F]
    q, k, v = jnp.split(h.reshape(B, C, 3, num_heads, F // num_heads), 3,
                        axis=2)
    q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(feats.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, C, F)
    out = proj(out)
    return jnp.where(mask[..., None], feats + out, 0.0)


def compute_neighbor_maps(grids: list[Grid], kernel_size: int = 3):
    """Precompute neighbor tables for a grid pyramid (one per level)."""
    return [neighbor_indexes(g, kernel_size) for g in grids]


def conv_plan(grid: Grid, backend: str = "auto",
              miss_capacity: int | None = None,
              check_overflow: bool = True,
              dense_bounds=None):
    """Build the per-grid plan SparseConv3d consumes (one per grid, reused by
    every conv on it).

    backend: "gather" (neighbor table), "window" (Pallas window-GEMM,
    ops/window_conv.py — the TPU fast path, 5-50x faster), "brick"
    (nn/brick.py), or "auto" = window on TPU, gather elsewhere (identical
    parameters/outputs, so the choice is purely a speed knob).

    Overflow policy: the window backend sizes its exact-fallback list as
    max(4096, C//8) by default (override with ``miss_capacity``) and
    NaN-poisons conv outputs if it ever overflows, so inexactness is always
    loud. The brick backend can silently drop voxels past brick capacity, so
    with ``check_overflow`` (default) this function raises immediately if
    ``plan.num_dropped > 0`` — plan building runs on the host, so the check
    costs one small sync, not a jit round-trip.

    ``dense_bounds=(ijk_min, dims)`` (static tuples declaring the model's
    crop cube, e.g. SparseVAEConfig.level_dense_bounds) replaces the plan
    build's 27-tap searchsorted with a dense slot-volume lookup — one
    scatter + one gather instead of log2(C) serialized gather rounds, the
    dominant plan-build cost. Window backend only; active voxels outside
    the declared bounds trip ``plan.overflowed`` (NaN-poisoned convs), so
    a wrong declaration is loud, never silently inexact."""
    import jax as _jax
    if backend == "auto":
        backend = "window" if _jax.devices()[0].platform == "tpu" \
            else "gather"
    if backend == "window":
        from infinicube_tpu.ops.window_conv import build_window_plan
        return build_window_plan(grid, miss_capacity=miss_capacity,
                                 dense_bounds=dense_bounds)
    if backend == "brick":
        from infinicube_tpu.nn.brick import build_brick_plan
        plan = build_brick_plan(grid)
        if check_overflow:
            dropped = int(_jax.device_get(plan.num_dropped.max()))
            if dropped:
                raise ValueError(
                    f"brick plan dropped {dropped} voxels (brick-capacity "
                    "overflow): convs on this plan would silently read "
                    "zeros and skew masked GroupNorm stats — raise "
                    "brick_capacity or use the window backend")
        return plan
    return neighbor_indexes(grid, 3)
