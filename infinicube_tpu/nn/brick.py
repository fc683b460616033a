"""Brick-dense sparse convolution: the TPU-native fast path for SparseConv3d.

The gather-GEMM conv (nn/sparse.py) is HBM-bound: 27 random row-gathers per
conv run at ~5-10% of HBM bandwidth on TPU. This module replaces random
access with *structured* access by exploiting the same insight as VDB's own
leaf nodes (fvdb stores dense 8^3 leaves; SURVEY.md §2.5): occupied space is
locally dense.

Pipeline (all jit-friendly, static shapes):

1. ``build_brick_plan(grid)``: partition active voxels into fixed-size bricks
   (default 4x4x4). Reuses the sorted-key machinery (`grid.build`): brick key
   = packed ``ijk // brick_shape``. The plan carries voxel<->dense-slot index
   maps and a 27-neighbor brick table — computed once per grid, reused by
   every conv on that grid (like ``neighbor_indexes``).
2. ``to_bricks`` / ``from_bricks``: one contiguous row-gather each way
   (sequential writes, unlike the 27 scattered tap gathers).
3. ``halo_pad``: assemble ``[B, NB, b0+2, b1+2, b2+2, F]`` from each brick's
   interior plus 26 neighbor-brick *slabs* — big contiguous blocks, so the
   gather rides HBM bandwidth instead of serializing.
4. ``brick_conv``: the 27-tap conv as static slices of the padded brick +
   MXU matmuls (or XLA's own 3D conv) — zero random access in the hot loop.

FLOP inflation = 1/brick-occupancy (empty slots inside occupied bricks are
computed then masked). For surface-like LiDAR/voxel data at 4^3 bricks this
is ~2-4x, and the dense math runs at MXU rates, netting 10-30x over the
gather-GEMM (see benchmarks/bench_brick_conv.py, docs/PERF.md).

Semantics match fvdb SparseConv3d (submanifold, stride 1): inputs outside the
active set contribute zeros; outputs are only defined on active voxels.
Reference capability: fvdb SparseConv3d used throughout
/root/reference/infinicube/voxelgen/modules/autoencoding/sunet.py:92-207.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import keys as K
from infinicube_tpu.grid.build import _unique_sorted_keys
from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import neighbor_offsets


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BrickPlan:
    """Static-shape brick decomposition of a Grid (see module docstring)."""
    brick_keys: jnp.ndarray   # uint32[B, NB] sorted brick keys
    brick_mask: jnp.ndarray   # bool  [B, NB]
    dense_src: jnp.ndarray    # int32 [B, NB*V] voxel row per dense slot (-1)
    voxel_dst: jnp.ndarray    # int32 [B, C] dense slot per voxel row (-1)
    nbr_brick: jnp.ndarray    # int32 [B, NB, 27] neighbor brick slot (-1)
    num_dropped: jnp.ndarray  # int32 [B] voxels lost to brick-capacity overflow
    brick_shape: tuple = dataclasses.field(metadata=dict(static=True),
                                           default=(4, 4, 4))

    @property
    def num_bricks(self) -> int:
        return self.brick_keys.shape[1]

    @property
    def brick_volume(self) -> int:
        return int(np.prod(self.brick_shape))

    @property
    def dense_mask(self) -> jnp.ndarray:
        """bool[B, NB*V]: which dense slots hold a real voxel."""
        return self.dense_src >= 0

    @property
    def overflowed(self) -> jnp.ndarray:
        return self.num_dropped > 0


def _row_searchsorted(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                      qvalid: jnp.ndarray) -> jnp.ndarray:
    """Per-row binary search: slot of each query key in sorted_keys, -1 if
    absent. sorted_keys uint32[B, NB]; queries uint32[B, N]."""
    NB = sorted_keys.shape[1]

    def row(sk, q):
        pos = jnp.searchsorted(sk, q)
        pos = jnp.clip(pos, 0, NB - 1)
        return jnp.where(sk[pos] == q, pos.astype(jnp.int32), -1)

    idx = jax.vmap(row)(sorted_keys, queries)
    return jnp.where(qvalid & (queries != K.INVALID_KEY), idx, -1)


@partial(jax.jit, static_argnames=("brick_shape", "brick_capacity"))
def build_brick_plan(grid: Grid, brick_shape: tuple = (4, 4, 4),
                     brick_capacity: int | None = None) -> BrickPlan:
    """Compute the brick decomposition of ``grid`` (once per grid; reuse for
    every conv on it).

    ``brick_capacity`` bounds the brick count (static). Default assumes >= 8
    active voxels per occupied brick on average; check ``plan.overflowed``
    when feeding grids of unknown density.
    """
    bs = np.asarray(brick_shape, np.int32)
    V = int(np.prod(bs))
    B, C = grid.mask.shape
    if brick_capacity is None:
        brick_capacity = max(8, C // 8)

    bijk = jnp.floor_divide(grid.ijk, jnp.asarray(bs))
    bq = K.pack(bijk, grid.mask)                       # uint32[B, C]
    ukeys, _ = _unique_sorted_keys(bq, brick_capacity)
    bmask = ukeys != K.INVALID_KEY
    NB = brick_capacity

    # voxel -> dense slot
    slot = _row_searchsorted(ukeys, bq, grid.mask)     # int32[B, C]
    local = grid.ijk - bijk * jnp.asarray(bs)
    lf = (local[..., 0] * int(bs[1]) + local[..., 1]) * int(bs[2]) \
        + local[..., 2]
    voxel_dst = jnp.where((slot >= 0) & grid.mask, slot * V + lf, -1)
    num_dropped = jnp.sum(grid.mask & (slot < 0), axis=-1).astype(jnp.int32)

    # dense slot -> voxel (inverse scatter; slots are unique by construction)
    rows = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, C))
    dst = jnp.where(voxel_dst >= 0, voxel_dst, NB * V)
    dense_src = jnp.full((B, NB * V), -1, jnp.int32)
    dense_src = jax.vmap(lambda d, i, r: d.at[i].set(r, mode="drop"))(
        dense_src, dst, rows)

    # 27-neighbor brick table (tap order = grid.ops.neighbor_offsets(3))
    offs = jnp.asarray(neighbor_offsets(3))            # [27, 3]
    b_of_bricks = jnp.where(bmask[..., None], K.unpack(ukeys), 0)
    nijk = b_of_bricks[:, :, None, :] + offs[None, None]   # [B, NB, 27, 3]
    nq = K.pack(nijk, jnp.broadcast_to(bmask[:, :, None], nijk.shape[:3]))
    nbr = _row_searchsorted(ukeys, nq.reshape(B, -1),
                            jnp.ones((B, NB * 27), bool)).reshape(B, NB, 27)

    return BrickPlan(brick_keys=ukeys, brick_mask=bmask, dense_src=dense_src,
                     voxel_dst=voxel_dst, nbr_brick=nbr,
                     num_dropped=num_dropped, brick_shape=tuple(brick_shape))


# ---------------------------------------------------------------------------
# data movement
# ---------------------------------------------------------------------------

def to_bricks(plan: BrickPlan, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, C, F] voxel rows -> [B, NB*V, F] brick-dense (zeros at empties)."""
    got = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(feats, plan.dense_src)
    return jnp.where((plan.dense_src >= 0)[..., None], got, 0)


def from_bricks(plan: BrickPlan, bricks: jnp.ndarray) -> jnp.ndarray:
    """[B, NB*V, F] brick-dense -> [B, C, F] voxel rows (zeros where the
    voxel's brick overflowed)."""
    got = jax.vmap(lambda d, i: d[jnp.clip(i, 0)])(bricks, plan.voxel_dst)
    return jnp.where((plan.voxel_dst >= 0)[..., None], got, 0)


def halo_pad(plan: BrickPlan, bricks: jnp.ndarray) -> jnp.ndarray:
    """[B, NB*V, F] -> [B, NB, b0+2, b1+2, b2+2, F] with 1-voxel halos pulled
    from the 26 neighbor bricks (absent neighbors = zeros).

    Each halo slab is one contiguous block-gather over the brick axis — the
    structured replacement for 27 random row-gathers.
    """
    b0, b1, b2 = plan.brick_shape
    B, NB = plan.brick_mask.shape
    F = bricks.shape[-1]
    x5 = bricks.reshape(B, NB, b0, b1, b2, F)
    padded = jnp.zeros((B, NB, b0 + 2, b1 + 2, b2 + 2, F), bricks.dtype)
    padded = padded.at[:, :, 1:-1, 1:-1, 1:-1, :].set(x5)

    def sl(d, n):        # source slab in the neighbor brick along one axis
        return {1: slice(0, 1), -1: slice(n - 1, n), 0: slice(0, n)}[d]

    def dl(d, n):        # destination slab in the padded brick
        return {1: slice(n + 1, n + 2), -1: slice(0, 1),
                0: slice(1, n + 1)}[d]

    offs = neighbor_offsets(3)
    for t, (di, dj, dk) in enumerate(offs):
        if di == 0 and dj == 0 and dk == 0:
            continue
        nb = plan.nbr_brick[:, :, t]                       # [B, NB]
        slab = x5[:, :, sl(di, b0), sl(dj, b1), sl(dk, b2), :]
        got = jax.vmap(lambda s, i: s[jnp.clip(i, 0)])(slab, nb)
        got = jnp.where((nb >= 0)[:, :, None, None, None, None], got, 0)
        padded = padded.at[:, :, dl(di, b0), dl(dj, b1), dl(dk, b2), :].set(got)
    return padded


# ---------------------------------------------------------------------------
# the conv itself (dense math on padded bricks)
# ---------------------------------------------------------------------------

def brick_conv_taps(padded: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """27-tap conv as static slices + MXU matmuls.

    padded [B, NB, b0+2, b1+2, b2+2, Fin]; w [27, Fin, Fout] in
    neighbor_offsets(3) tap order (same layout as SparseConv3d.kernel).
    Returns [B, NB*V, Fout].
    """
    B, NB, p0, p1, p2, Fin = padded.shape
    b0, b1, b2 = p0 - 2, p1 - 2, p2 - 2
    out = None
    for t, (di, dj, dk) in enumerate(neighbor_offsets(3)):
        tap = padded[:, :, 1 + di:1 + di + b0, 1 + dj:1 + dj + b1,
                     1 + dk:1 + dk + b2, :]
        tap = tap.reshape(B, NB * b0 * b1 * b2, Fin)
        contrib = jnp.einsum("bnf,fo->bno", tap, w[t])
        out = contrib if out is None else out + contrib
    return out


def brick_conv_xla(padded: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Same contraction via XLA's 3D convolution (NDHWC, VALID)."""
    B, NB, p0, p1, p2, Fin = padded.shape
    b0, b1, b2 = p0 - 2, p1 - 2, p2 - 2
    Fout = w.shape[-1]
    x = padded.reshape(B * NB, p0, p1, p2, Fin)
    kern = w.reshape(3, 3, 3, Fin, Fout)
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=padded.dtype)
    return y.reshape(B, NB * b0 * b1 * b2, Fout)


def brick_sparse_conv(plan: BrickPlan, feats: jnp.ndarray, w: jnp.ndarray,
                      impl: str = "taps") -> jnp.ndarray:
    """Full sparse conv on voxel rows through the brick path.

    feats [B, C, Fin], w [27, Fin, Fout] -> [B, C, Fout]. Matches
    SparseConv3d's gather-GEMM output exactly on active voxels (modulo brick
    overflow, surfaced via plan.num_dropped).
    """
    bricks = to_bricks(plan, feats)
    padded = halo_pad(plan, bricks)
    conv = brick_conv_xla if impl == "xla" else brick_conv_taps
    out = conv(padded, w)
    return from_bricks(plan, out)
