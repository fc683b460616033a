"""Data-carrying grid ops: gathers/scatters between grids, dense blocks,
points, and parent/child grids.

These are the TPU equivalents of the fvdb data ops the reference leans on
(SURVEY.md §2.5): to_dense / read_from_dense (unet_dense.py:725,753),
fill_from_grid, splat_trilinear, sample_trilinear, neighbor_indexes, and the
point->voxel attribute reductions (utils/fvdb_utils.py:171-207). Everything is
a jnp gather / scatter / segment op so XLA fuses it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import keys as K
from infinicube_tpu.grid.build import coarsened_grid, grid_from_keys, subdivided_grid
from infinicube_tpu.grid.grid import Grid

# Masked-max sentinel. Must be FINITE: scatter-max's VJP splits gradient
# among tied maxima with a div, and -inf ties make it 0/0 = NaN. Large
# enough that no real feature value reaches it, small enough that bf16
# round-trips it.
_NEG_SENTINEL = -7.0e37


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_max_safe(flat: jnp.ndarray, vals: jnp.ndarray, C: int):
    """Masked scatter-max with a NaN-safe backward.

    ``flat`` int32[N] target rows (== C drops the entry); ``vals``
    f32[N, F] already sentinel-filled on masked rows. Returns f32[C, F]
    (empty rows hold _NEG_SENTINEL). JAX's built-in scatter-max VJP
    computes ``g / num_ties`` with num_ties = 0 off the tie set before
    select-masking it — the stray 0/0 both trips jax_debug_nans and was
    measured producing real NaN grads in the GSM train step. This backward
    routes grad to tying children with a guarded div only."""
    return (jnp.full((C, F := vals.shape[-1]), _NEG_SENTINEL, jnp.float32)
            .at[flat].max(vals, mode="drop"))


def _scatter_max_safe_fwd(flat, vals, C):
    out = _scatter_max_safe(flat, vals, C)
    return out, (flat, vals, out)


def _scatter_max_safe_bwd(C, res, g):
    flat, vals, out = res
    safe = jnp.clip(flat, 0, C - 1)
    hit = (vals == out[safe]) & (flat < C)[..., None]
    ties = (jnp.zeros((C, vals.shape[-1]), jnp.float32)
            .at[flat].add(hit.astype(jnp.float32), mode="drop"))
    g_vals = jnp.where(hit, g[safe] / jnp.maximum(ties[safe], 1.0), 0.0)
    return None, g_vals


_scatter_max_safe.defvjp(_scatter_max_safe_fwd, _scatter_max_safe_bwd)


# ---------------------------------------------------------------------------
# dense <-> sparse
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dense_dims",))
def to_dense(grid: Grid, data: jnp.ndarray, ijk_min, dense_dims) -> jnp.ndarray:
    """Scatter sparse data [B, C, F] into a dense block [B, D, H, W, F].

    Voxels outside [ijk_min, ijk_min + dense_dims) are dropped (fvdb to_dense
    crops likewise)."""
    D, H, W = dense_dims
    rel = grid.ijk - jnp.asarray(ijk_min, jnp.int32)
    ok = grid.mask & jnp.all((rel >= 0) & (rel < jnp.array([D, H, W])), axis=-1)
    flat = (rel[..., 0] * H + rel[..., 1]) * W + rel[..., 2]
    flat = jnp.where(ok, flat, D * H * W)  # dropped
    out = jnp.zeros((grid.batch_size, D * H * W, data.shape[-1]), data.dtype)
    out = jax.vmap(lambda o, f, d: o.at[f].set(d, mode="drop"))(out, flat, data)
    return out.reshape(grid.batch_size, D, H, W, data.shape[-1])


def read_from_dense(grid: Grid, dense: jnp.ndarray, ijk_min) -> jnp.ndarray:
    """Gather dense [B, D, H, W, F] at the grid's voxels -> [B, C, F]."""
    D, H, W = dense.shape[1:4]
    rel = grid.ijk - jnp.asarray(ijk_min, jnp.int32)
    ok = grid.mask & jnp.all((rel >= 0) & (rel < jnp.array([D, H, W])), axis=-1)
    rel = jnp.clip(rel, 0, jnp.array([D - 1, H - 1, W - 1]))
    out = jax.vmap(lambda dn, r: dn[r[:, 0], r[:, 1], r[:, 2]])(dense, rel)
    return jnp.where(ok[..., None], out, 0)


def occupancy_dense(grid: Grid, ijk_min, dense_dims) -> jnp.ndarray:
    """bool[B, D, H, W] occupancy block."""
    occ = to_dense(grid, grid.mask[..., None].astype(jnp.int32), ijk_min, dense_dims)
    return occ[..., 0] > 0


# ---------------------------------------------------------------------------
# grid <-> grid
# ---------------------------------------------------------------------------

def fill_from_grid(dst: Grid, src: Grid, src_data: jnp.ndarray) -> jnp.ndarray:
    """fvnn.FillFromGrid: for each dst voxel, copy data of the src voxel whose
    cell contains the dst voxel center (0 where absent). Handles differing
    voxel sizes/origins through world space."""
    centers = dst.voxel_centers()                       # [B, C, 3]
    idx = src.ijk_to_index(src.world_to_ijk(centers), dst.mask)
    got = jax.vmap(lambda d, i: d[jnp.clip(i, 0)])(src_data, idx)
    return jnp.where((idx >= 0)[..., None], got, 0)


def index_map(dst: Grid, src: Grid) -> jnp.ndarray:
    """int32[B, C_dst] index into src rows for same-world-position voxels
    (assumes equal voxel_size/origin); -1 where missing."""
    return src.key_to_index(jnp.where(dst.mask, dst.keys, K.INVALID_KEY))


# ---------------------------------------------------------------------------
# points <-> grid
# ---------------------------------------------------------------------------

def splat_trilinear(grid: Grid, points: jnp.ndarray, point_feats: jnp.ndarray,
                    point_mask: jnp.ndarray) -> jnp.ndarray:
    """fvdb splat_trilinear: scatter-add point features to the 8 nearest voxel
    centers with trilinear weights. points f32[B, N, 3], feats [B, N, F]."""
    gc = grid.world_to_grid(points)                      # [B, N, 3]
    base = jnp.floor(gc).astype(jnp.int32)
    frac = gc - base
    corners = jnp.asarray(np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                               indexing="ij"), -1).reshape(8, 3),
                          jnp.int32)
    ijk8 = base[:, :, None, :] + corners[None, None]     # [B, N, 8, 3]
    w = jnp.prod(jnp.where(corners[None, None].astype(bool),
                           frac[:, :, None, :], 1.0 - frac[:, :, None, :]),
                 axis=-1)                                # [B, N, 8]
    idx = grid.ijk_to_index(ijk8.reshape(grid.batch_size, -1, 3),
                            jnp.repeat(point_mask, 8, axis=-1))
    idx = idx.reshape(*ijk8.shape[:3])
    w = jnp.where((idx >= 0) & point_mask[:, :, None], w, 0.0)
    F = point_feats.shape[-1]
    contrib = (w[..., None] * point_feats[:, :, None, :]).reshape(
        grid.batch_size, -1, F)
    flat_idx = jnp.where(idx >= 0, idx, grid.capacity).reshape(grid.batch_size, -1)
    out = jnp.zeros((grid.batch_size, grid.capacity, F), point_feats.dtype)
    return jax.vmap(lambda o, i, c: o.at[i].add(c, mode="drop"))(
        out, flat_idx, contrib)


def sample_trilinear(grid: Grid, data: jnp.ndarray, points: jnp.ndarray,
                     point_mask: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of voxel data at world points -> [B, N, F].
    Missing neighbors contribute 0 (matches fvdb sample_trilinear)."""
    gc = grid.world_to_grid(points)
    base = jnp.floor(gc).astype(jnp.int32)
    frac = gc - base
    corners = jnp.asarray(np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                               indexing="ij"), -1).reshape(8, 3),
                          jnp.int32)
    ijk8 = base[:, :, None, :] + corners[None, None]
    w = jnp.prod(jnp.where(corners[None, None].astype(bool),
                           frac[:, :, None, :], 1.0 - frac[:, :, None, :]),
                 axis=-1)
    idx = grid.ijk_to_index(ijk8.reshape(grid.batch_size, -1, 3),
                            jnp.repeat(point_mask, 8, axis=-1))
    idx = idx.reshape(*ijk8.shape[:3])
    got = jax.vmap(lambda d, i: d[jnp.clip(i, 0)])(
        data, idx.reshape(grid.batch_size, -1))
    got = got.reshape(*ijk8.shape[:3], data.shape[-1])
    w = jnp.where(idx >= 0, w, 0.0)
    return jnp.sum(w[..., None] * got, axis=2)


# ---------------------------------------------------------------------------
# point -> voxel attribute reduction (fvdb_utils.points_to_fvdb semantics)
# ---------------------------------------------------------------------------

def scatter_to_grid(grid: Grid, points: jnp.ndarray, values: jnp.ndarray,
                    point_mask: jnp.ndarray, reduce: str = "sum") -> jnp.ndarray:
    """Reduce per-point values into the voxel containing each point.

    values [B, N, F] -> [B, C, F]; reduce in {sum, max, mean}.
    (torch_scatter equivalent; reference fvdb_utils.py:178-207.)"""
    idx = grid.ijk_to_index(grid.world_to_ijk(points), point_mask)
    ok = (idx >= 0) & point_mask
    flat = jnp.where(ok, idx, grid.capacity)
    C, F = grid.capacity, values.shape[-1]
    if reduce == "sum" or reduce == "mean":
        out = jax.vmap(lambda i, v: jnp.zeros((C, F), values.dtype)
                       .at[i].add(v, mode="drop"))(flat, jnp.where(ok[..., None], values, 0))
        if reduce == "mean":
            cnt = jax.vmap(lambda i, v: jnp.zeros((C, 1), jnp.float32)
                           .at[i].add(v, mode="drop"))(
                flat, ok[..., None].astype(jnp.float32))
            out = out / jnp.maximum(cnt, 1.0)
        return out
    if reduce == "max":
        out = jax.vmap(lambda i, v: _scatter_max_safe(i, v, C))(
            flat, jnp.where(ok[..., None], values.astype(jnp.float32),
                            _NEG_SENTINEL))
        return jnp.where(out > _NEG_SENTINEL / 2, out, 0.0).astype(
            values.dtype)
    raise ValueError(f"unknown reduce {reduce}")


def majority_label(grid: Grid, points: jnp.ndarray, labels: jnp.ndarray,
                   point_mask: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-voxel argmax over one-hot label counts (the semantics reduction of
    points_to_fvdb, fvdb_utils.py:171-193). labels int32[B, N] -> int32[B, C]."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    votes = scatter_to_grid(grid, points, onehot, point_mask, reduce="sum")
    return jnp.argmax(votes, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# neighborhoods (sparse conv support)
# ---------------------------------------------------------------------------

def neighbor_offsets(kernel_size) -> np.ndarray:
    """int32[K, 3] kernel tap offsets, row-major over the kernel window,
    centered (kernel_size odd)."""
    ks = np.broadcast_to(np.asarray(kernel_size), (3,))
    r = [np.arange(k) - k // 2 for k in ks]
    return np.stack(np.meshgrid(*r, indexing="ij"), -1).reshape(-1, 3).astype(np.int32)


def neighbor_indexes(grid: Grid, kernel_size=3,
                     dense_bounds=None) -> jnp.ndarray:
    """fvdb neighbor_indexes: int32[B, C, K] slot index of each kernel-tap
    neighbor (-1 = absent). K = prod(kernel_size).

    ``dense_bounds=(ijk_min, dims)`` (STATIC tuples) switches the lookup
    from the 27-tap searchsorted (log2(C) serialized gathers per query —
    the dominant cost of sparse-conv plan builds, ~0.3 s at 131k voxels) to
    a dense slot volume over the declared crop: one scatter + ONE gather
    per query. Models whose configs declare a crop cube (VAE hash tree,
    latent diffusion, GSM) pass their per-level bounds; the volume costs
    prod(dims) int32 (33 MB at the VAE's finest 256x256x128 level).
    Exactness is guarded loudly: active voxels outside the declared bounds
    make the lookup wrong, so they are NaN-poison-free checked here via a
    dump-slot count surfaced in ``conv_plan`` (the same policy as window /
    brick overflow)."""
    offs = jnp.asarray(neighbor_offsets(kernel_size))    # [K, 3]
    nijk = grid.ijk[:, :, None, :] + offs[None, None]    # [B, C, K, 3]
    B, C, Kn = nijk.shape[:3]
    valid = jnp.broadcast_to(grid.mask[:, :, None], (B, C, Kn))
    if dense_bounds is not None:
        ijk_min, dims = dense_bounds
        return _neighbor_indexes_dense(grid, nijk, valid, tuple(ijk_min),
                                       tuple(dims))
    idx = grid.ijk_to_index(nijk.reshape(B, -1, 3), valid.reshape(B, -1))
    return idx.reshape(B, C, Kn)


@partial(jax.jit, static_argnames=("ijk_min", "dims"))
def _neighbor_indexes_dense(grid: Grid, nijk, valid, ijk_min, dims):
    B, C = grid.mask.shape
    Kn = nijk.shape[2]
    X, Y, Z = dims
    off = jnp.asarray(ijk_min, jnp.int32)
    dim = jnp.asarray(dims, jnp.int32)
    loc = grid.ijk - off                                  # [B, C, 3]
    inb = jnp.all((loc >= 0) & (loc < dim), axis=-1) & grid.mask
    flat = jnp.where(inb, (loc[..., 0] * Y + loc[..., 1]) * Z + loc[..., 2],
                     X * Y * Z)                           # dump slot
    slot = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, C))
    # padding/out-of-bounds slots scatter to the dump cell, which invalid
    # queries also read — reset it to -1 after the scatter
    vol = jax.vmap(lambda f, s: jnp.full((X * Y * Z + 1,), -1, jnp.int32)
                   .at[f].set(s, mode="drop").at[-1].set(-1))(flat, slot)
    nloc = nijk - off
    ninb = jnp.all((nloc >= 0) & (nloc < dim), axis=-1) & valid
    nflat = jnp.where(
        ninb, (nloc[..., 0] * Y + nloc[..., 1]) * Z + nloc[..., 2],
        X * Y * Z)
    idx = jax.vmap(lambda v, f: v[f])(vol, nflat.reshape(B, -1))
    return idx.reshape(B, C, Kn)


def dense_bounds_violations(grid: Grid, ijk_min, dims) -> jnp.ndarray:
    """int32[B]: active voxels OUTSIDE the declared dense bounds — must be 0
    for a dense-bounds neighbor lookup to be exact."""
    loc = grid.ijk - jnp.asarray(ijk_min, jnp.int32)
    inb = jnp.all((loc >= 0) & (loc < jnp.asarray(dims, jnp.int32)),
                  axis=-1)
    return jnp.sum(grid.mask & ~inb, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pooling / upsampling data movement
# ---------------------------------------------------------------------------

def max_pool(grid: Grid, data: jnp.ndarray, factor,
             coarse: Grid | None = None, capacity: int | None = None):
    """fvnn.MaxPool: coarsen the grid and segment-max child data into parents.
    Returns (coarse_grid, coarse_data). If ``coarse`` is given (hash-tree
    guided pooling, sunet.py:332-334) pool into it instead of deriving one."""
    if coarse is None:
        coarse = coarsened_grid(grid, tuple(np.broadcast_to(np.asarray(factor), (3,))),
                                capacity=capacity or grid.capacity)
    f = jnp.asarray(np.broadcast_to(np.asarray(factor), (3,)), jnp.int32)
    pijk = jnp.floor_divide(grid.ijk, f)
    pidx = coarse.ijk_to_index(pijk, grid.mask)
    ok = (pidx >= 0) & grid.mask
    flat = jnp.where(ok, pidx, coarse.capacity)
    Cc, F = coarse.capacity, data.shape[-1]
    # NaN-safe masked scatter-max (see _scatter_max_safe: this max_pool
    # sits in every GSM/VAE encoder backward)
    out = jax.vmap(lambda i, v: _scatter_max_safe(i, v, Cc))(
        flat, jnp.where(ok[..., None], data.astype(jnp.float32),
                        _NEG_SENTINEL))
    out = jnp.where(out > _NEG_SENTINEL / 2, out, 0.0).astype(data.dtype)
    out = jnp.where(coarse.mask[..., None], out, 0)
    return coarse, out


def avg_pool(grid: Grid, data: jnp.ndarray, factor,
             coarse: Grid | None = None, capacity: int | None = None):
    """fvnn.AvgPool (averages over *present* children)."""
    if coarse is None:
        coarse = coarsened_grid(grid, tuple(np.broadcast_to(np.asarray(factor), (3,))),
                                capacity=capacity or grid.capacity)
    f = jnp.asarray(np.broadcast_to(np.asarray(factor), (3,)), jnp.int32)
    pidx = coarse.ijk_to_index(jnp.floor_divide(grid.ijk, f), grid.mask)
    ok = (pidx >= 0) & grid.mask
    flat = jnp.where(ok, pidx, coarse.capacity)
    Cc, F = coarse.capacity, data.shape[-1]
    out = jax.vmap(lambda i, v: jnp.zeros((Cc, F), jnp.float32)
                   .at[i].add(v, mode="drop"))(
        flat, jnp.where(ok[..., None], data.astype(jnp.float32), 0.0))
    cnt = jax.vmap(lambda i, v: jnp.zeros((Cc, 1), jnp.float32)
                   .at[i].add(v, mode="drop"))(flat, ok[..., None].astype(jnp.float32))
    out = (out / jnp.maximum(cnt, 1.0)).astype(data.dtype)
    return coarse, jnp.where(coarse.mask[..., None], out, 0)


def upsample_nearest(grid: Grid, data: jnp.ndarray, factor,
                     fine: Grid | None = None, submask: jnp.ndarray | None = None,
                     capacity: int | None = None):
    """fvnn.UpsamplingNearest with optional structure mask: children copy their
    parent's features. If ``fine`` is given (guided decode), gather into it."""
    ftup = tuple(int(x) for x in np.broadcast_to(np.asarray(factor), (3,)))
    if fine is None:
        fine = subdivided_grid(grid, ftup, submask=submask,
                               capacity=capacity or grid.capacity * int(np.prod(ftup)))
    f = jnp.asarray(ftup, jnp.int32)
    pidx = grid.ijk_to_index(jnp.floor_divide(fine.ijk, f), fine.mask)
    got = jax.vmap(lambda d, i: d[jnp.clip(i, 0)])(data, pidx)
    return fine, jnp.where(((pidx >= 0) & fine.mask)[..., None], got, 0)
