"""Window-GEMM sparse convolution — the Pallas fast path for SparseConv3d.

Measured facts that force this design (v5e, docs/PERF.md): XLA gathers run at
a fixed ~190M rows/s regardless of contiguity or slice size, so ANY per-tap
row-gather formulation (27 gathers: nn/sparse.py; brick halos: nn/brick.py)
is gather-rate-bound at 1-2 TF/s. The only fast data movement is contiguous
DMA, and the only fast compute is the MXU.

Key insight: grid keys sort lexicographically in (i, j, k), so for a block of
P consecutive output voxels, ALL inputs under a tap direction (di, dj) live
in one contiguous ~W-row span of the sorted feature array (the (i+di, j+dj)
column's actives; the three dk taps share it). So:

1. ``build_window_plan(grid)``: per output block, 9 directional window starts
   (128-row aligned) + per-tap window-relative one-hot positions. Neighbors
   that fall outside their window (rare: big k-gaps) go to a fixed-capacity
   exact **fallback list** — never silently dropped (overflow surfaced).
2. Pallas kernel: scalar-prefetched starts drive data-dependent BlockSpec
   index maps, so windows stream HBM->VMEM as pipelined 16KB DMAs; inside,
   selection one-hots are built on the VPU and applied as MXU matmuls
   ``(sel @ window) @ W_tap`` — zero gathers anywhere.
3. Exact fallback: the missed (out, in, tap) triples are applied in XLA
   (one small gather + scatter-add), keeping the conv semantics exactly
   fvdb's submanifold conv.

Backward is the same stencil reversed (``w_rev[t] = w[26-t].T`` — the 3^3
offset list is symmetric under reversal) plus a dW accumulation kernel, so
training runs entirely on the fast path.

Reference capability: fvdb SparseConv3d (SURVEY.md §2.5), as used by
/root/reference/infinicube/voxelgen/modules/autoencoding/sunet.py:92-207.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import neighbor_indexes


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Per-grid window decomposition (build once per grid, reuse per conv)."""
    starts: jnp.ndarray      # int32[B, CB, 9]  window start (wblock units)
    pos: jnp.ndarray         # int32[B, CB, 27, P] window-relative row (-1)
    miss_out: jnp.ndarray    # int32[B, M] output row of fallback pair (-1 pad)
    miss_in: jnp.ndarray     # int32[B, M] input row
    miss_tap: jnp.ndarray    # int32[B, M] tap id
    num_missed: jnp.ndarray  # int32[B] total misses (exact iff <= M)
    block_rows: int = dataclasses.field(metadata=dict(static=True),
                                        default=128)
    window_rows: int = dataclasses.field(metadata=dict(static=True),
                                         default=256)
    window_block: int = dataclasses.field(metadata=dict(static=True),
                                          default=64)

    @property
    def overflowed(self) -> jnp.ndarray:
        """True where misses exceeded fallback capacity (conv inexact —
        rebuild with a larger miss_capacity or window)."""
        return self.num_missed > self.miss_out.shape[1]


@partial(jax.jit, static_argnames=("block_rows", "window_rows",
                                   "window_block", "miss_capacity",
                                   "dense_bounds"))
def build_window_plan(grid: Grid, block_rows: int = 128,
                      window_rows: int = 256, window_block: int = 64,
                      miss_capacity: int | None = None,
                      dense_bounds=None) -> WindowPlan:
    """``dense_bounds=(ijk_min, dims)`` (static tuples) switches the
    neighbor lookup from the 27-tap searchsorted (~0.3 s of the ~0.5 s plan
    build at 131k voxels) to a dense slot volume over the declared crop —
    one scatter + one gather (see grid.ops.neighbor_indexes). Exactness
    guard: active voxels OUTSIDE the declared bounds would be invisible to
    the dense lookup, so their count is folded into ``num_missed`` past
    capacity, making ``plan.overflowed`` true and NaN-poisoning conv
    outputs (same loud policy as fallback overflow) — never a silently
    inexact conv."""
    P, W, WB = block_rows, window_rows, window_block
    B, C = grid.mask.shape
    if miss_capacity is None:
        # Measured miss count on a Waymo-like surface grid is ~3437 at
        # C=131k (~C/38); denser/less-regular grids miss more, so default
        # to C/8 (≥4096) rather than a fixed constant. Overflow is still
        # surfaced loudly (NaN-poisoned outputs) in window_sparse_conv.
        miss_capacity = max(4096, C // 8)
    if C % P or C % WB or W % WB:
        raise ValueError("capacity must be a multiple of the window block")
    CB = C // P
    NBLK = C // WB
    nwin = W // WB

    idx = neighbor_indexes(grid, 3, dense_bounds=dense_bounds)  # [B, C, 27]
    idxb = idx.reshape(B, CB, P, 27).transpose(0, 1, 3, 2)  # [B, CB, 27, P]
    valid = idxb >= 0
    big = jnp.where(valid, idxb, jnp.int32(1 << 30))
    dmin = big.reshape(B, CB, 9, 3, P).min(axis=(3, 4))     # [B, CB, 9]
    starts = jnp.clip(dmin // WB, 0, NBLK - nwin).astype(jnp.int32)

    dirs = jnp.repeat(jnp.arange(9), 3)                 # tap -> direction
    s_tap = jnp.take(starts, dirs, axis=2)              # [B, CB, 27]
    pos = idxb - s_tap[..., None] * WB
    inwin = valid & (pos >= 0) & (pos < W)
    pos = jnp.where(inwin, pos, -1).astype(jnp.int32)

    # fallback compaction: flat order (block, tap, o). O(N) cumsum+scatter
    # (a sort here costs ~1s/step at 131k-voxel scale; plans rebuild per
    # training batch, so plan build must stay cheap)
    miss = (valid & ~inwin).reshape(B, -1)              # [B, CB*27*P]
    N = miss.shape[1]
    num_missed = jnp.sum(miss, axis=1).astype(jnp.int32)
    if dense_bounds is not None:
        from infinicube_tpu.grid.ops import dense_bounds_violations
        viol = dense_bounds_violations(grid, *dense_bounds)
        num_missed = num_missed + viol * jnp.int32(miss_capacity + 1)
    dst = jnp.where(miss, jnp.cumsum(miss, axis=1) - 1, miss_capacity)
    src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    top = jnp.full((B, miss_capacity), N, jnp.int32)
    top = jax.vmap(lambda t, d, s: t.at[d].set(s, mode="drop"))(
        top, dst, src)
    ok = top < N
    top = jnp.where(ok, top, 0)
    # decode (block, tap, o) -> rows
    blk = top // (27 * P)
    tap = (top // P) % 27
    o = top % P
    out_row = blk * P + o
    in_row = jnp.take_along_axis(
        idxb.reshape(B, -1), jnp.where(ok, top, 0), axis=1)
    miss_out = jnp.where(ok, out_row, -1).astype(jnp.int32)
    miss_in = jnp.where(ok, in_row, -1).astype(jnp.int32)
    miss_tap = jnp.where(ok, tap, -1).astype(jnp.int32)
    return WindowPlan(starts=starts, pos=pos, miss_out=miss_out,
                      miss_in=miss_in, miss_tap=miss_tap,
                      num_missed=num_missed, block_rows=P, window_rows=W,
                      window_block=WB)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _conv_kernel(P, W, nwin, acc_dtype):
    def kernel(starts_ref, pos_ref, *args):
        wins, (wk_ref, out_ref) = args[:-2], args[-2:]
        iw = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
        acc = jnp.zeros((P, wk_ref.shape[-1]), jnp.float32)
        for d in range(9):
            win = jnp.concatenate(
                [wins[d * nwin + j][0] for j in range(nwin)], axis=0)
            for dk in range(3):
                tap = d * 3 + dk
                p = pos_ref[0, 0, tap, :]
                sel = (iw == p[:, None]).astype(win.dtype)
                rows = jnp.dot(sel, win, preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(rows.astype(win.dtype), wk_ref[tap],
                                    preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(acc_dtype)
    return kernel


def _dw_kernel(P, W, nwin):
    def kernel(starts_ref, pos_ref, *args):
        wins = args[:9 * nwin]
        g_ref, dw_ref = args[9 * nwin], args[9 * nwin + 1]

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        iw = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
        g = g_ref[0].astype(jnp.float32)
        for d in range(9):
            win = jnp.concatenate(
                [wins[d * nwin + j][0] for j in range(nwin)], axis=0)
            for dk in range(3):
                tap = d * 3 + dk
                p = pos_ref[0, 0, tap, :]
                sel = (iw == p[:, None]).astype(win.dtype)
                rows = jnp.dot(sel, win, preferred_element_type=jnp.float32)
                dw_ref[tap] += jax.lax.dot_general(
                    rows, g, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    return kernel


def _window_specs(nwin, F, wblock):
    """9*nwin window BlockSpecs: (1, wblock, F) at data-dependent rows.

    The prefetched starts ref is FLATTENED to [B, CB*9]: as an SMEM
    operand a [B, CB, 9] array pads its minor dim 9 -> 128, and at
    release GSM scale (C=262144, CB=2048) that padded copy is exactly
    the 1 MB SMEM capacity (measured OOM: 2048*128*4 = 1.00M). The
    flat layout's minor dim is CB*9, which never pads materially."""
    specs = []
    for d in range(9):
        for j in range(nwin):
            specs.append(pl.BlockSpec(
                (1, wblock, F),
                functools.partial(
                    lambda b, i, s, d=0, j=0: (b, s[b, i * 9 + d] + j, 0),
                    d=d, j=j),
                memory_space=pltpu.VMEM))
    return specs


def _conv_core(plan: WindowPlan, feats: jnp.ndarray,
               w: jnp.ndarray) -> jnp.ndarray:
    """The windowed part of the conv (no fallback). feats [B, C, F]."""
    B, C, F = feats.shape
    P, W = plan.block_rows, plan.window_rows
    CB, nwin = C // P, W // plan.window_block
    Fo = w.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, CB),
        in_specs=[
            pl.BlockSpec((1, 1, 27, P), lambda b, i, s: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_window_specs(nwin, F, plan.window_block),
            pl.BlockSpec((27, F, Fo), lambda b, i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, Fo), lambda b, i, s: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _conv_kernel(P, W, nwin, feats.dtype),
        out_shape=jax.ShapeDtypeStruct((B, C, Fo), feats.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(plan.starts.reshape(B, CB * 9), plan.pos,
      *([feats] * (9 * nwin)), w.astype(feats.dtype))


def _dw_core(plan: WindowPlan, feats: jnp.ndarray,
             g: jnp.ndarray) -> jnp.ndarray:
    """dL/dw [27, F, Fo] accumulated over all blocks."""
    B, C, F = feats.shape
    P, W = plan.block_rows, plan.window_rows
    CB, nwin = C // P, W // plan.window_block
    Fo = g.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, CB),
        in_specs=[
            pl.BlockSpec((1, 1, 27, P), lambda b, i, s: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_window_specs(nwin, F, plan.window_block),
            pl.BlockSpec((1, P, Fo), lambda b, i, s: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, F, Fo), lambda b, i, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _dw_kernel(P, W, nwin),
        out_shape=jax.ShapeDtypeStruct((27, F, Fo), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(plan.starts.reshape(B, CB * 9), plan.pos,
      *([feats] * (9 * nwin)), g)


def _fallback(plan: WindowPlan, feats: jnp.ndarray, w: jnp.ndarray,
              out: jnp.ndarray) -> jnp.ndarray:
    """Exact correction for window misses (XLA; M is small)."""
    ok = plan.miss_tap >= 0
    x = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(feats, plan.miss_in)
    onehot = jax.nn.one_hot(jnp.clip(plan.miss_tap, 0), 27, dtype=w.dtype)
    contrib = jnp.einsum("bmf,bmt,tfo->bmo", x.astype(w.dtype), onehot, w)
    contrib = jnp.where(ok[..., None], contrib, 0).astype(out.dtype)
    dst = jnp.where(ok, plan.miss_out, out.shape[1])
    return jax.vmap(lambda o, i, c: o.at[i].add(c, mode="drop"))(
        out, dst, contrib)


def _rev_w(w: jnp.ndarray) -> jnp.ndarray:
    """Transposed stencil: w_rev[t] = w[26-t].T (offsets negate under
    reversal of the row-major 3^3 tap list)."""
    return jnp.flip(w, axis=0).transpose(0, 2, 1)


@jax.custom_vjp
def window_sparse_conv(plan: WindowPlan, feats: jnp.ndarray,
                       w: jnp.ndarray) -> jnp.ndarray:
    """Sparse submanifold 3^3 conv on voxel rows.

    feats [B, C, F], w [27, F, Fo] (neighbor_offsets tap order, same layout
    as SparseConv3d.kernel) -> [B, C, Fo]. Exact iff not plan.overflowed;
    an overflowed plan NaN-poisons its batch rows so a capacity miss is a
    loud training failure (NaN-skip/crash), never a silently inexact conv —
    rebuild the plan with a larger ``miss_capacity`` to recover."""
    out = _conv_core(plan, feats, w)
    out = _fallback(plan, feats, w, out)
    return jnp.where(plan.overflowed[:, None, None], jnp.nan, out)


def _wc_fwd(plan, feats, w):
    return window_sparse_conv(plan, feats, w), (plan, feats, w)


def _wc_bwd(res, g):
    plan, feats, w = res
    # dfeats = the same stencil with reversed-transposed weights:
    # dx[m] = sum over active pairs (m, t') of g[nbr(m, t')] @ w_rev[t'].
    # The backward core shares the plan's coverage, so its miss set is the
    # SAME triple list — replay it with g as input and w_rev as weights.
    w_rev = _rev_w(w).astype(g.dtype)
    dx = _conv_core(plan, g, w_rev)
    dx = _fallback(plan, g, w_rev, dx).astype(feats.dtype)

    dw = _dw_core(plan, feats, g)
    # fallback contribution to dw: dw[t] += x_in^T g_out per miss pair
    ok = plan.miss_tap >= 0
    x = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(feats, plan.miss_in)
    go = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(g, plan.miss_out)
    onehot = jax.nn.one_hot(jnp.clip(plan.miss_tap, 0), 27,
                            dtype=jnp.float32)
    onehot = jnp.where(ok[..., None], onehot, 0)
    dw = dw + jnp.einsum("bmt,bmf,bmo->tfo", onehot,
                         x.astype(jnp.float32), go.astype(jnp.float32))
    zeros = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plan)
    return zeros, dx, dw.astype(w.dtype)


window_sparse_conv.defvjp(_wc_fwd, _wc_bwd)
