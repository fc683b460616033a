"""K-nearest-neighbor queries.

TPU-native replacement for the reference's CUDA KNN extension (SURVEY.md §2.1
N1: ext/common knn_query_fast — a GPU KD-tree with a brute-force fallback for
<64 references, knn.cu:23-28) and its consumers
(voxelgen/utils/color_util.semantic_from_points / color_from_points — used to
propagate semantics onto coarsened/latent grids, base_model.py:674-699,
voxel_util.py:1231).

Two device paths:
- ``knn_bruteforce``: tiled distance matrix + top-k (MXU-friendly: the
  pairwise distances are one rank-3 matmul); right for M x N up to ~10^8
  pairs, chunked over queries to bound memory.
- ``knn_grid_hash``: voxel-hash candidate gathering — references are binned
  into a coarse grid (via the packed-key core) and each query scans only the
  27 neighboring cells' candidates; right for the uniform point sets the
  pipeline actually queries (voxel centers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from infinicube_tpu.grid import keys as GK


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_bruteforce(query: jnp.ndarray, ref: jnp.ndarray,
                   ref_mask: jnp.ndarray | None = None, k: int = 1,
                   chunk: int = 4096):
    """query f32[N, 3], ref f32[M, 3] -> (sq_dist f32[N, k], idx int32[N, k]).

    Matches knn_query_fast's return convention (squared distances)."""
    M = ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((M,), bool)
    ref_sq = jnp.sum(ref * ref, axis=-1)
    big = jnp.float32(1e30)

    def body(q):
        d = jnp.sum(q * q, -1)[:, None] - 2.0 * (q @ ref.T) + ref_sq[None]
        d = jnp.where(ref_mask[None], d, big)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx.astype(jnp.int32)

    N = query.shape[0]
    pad = (-N) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, 3)
    dists, idxs = jax.lax.map(body, qc)
    return (dists.reshape(-1, k)[:N], idxs.reshape(-1, k)[:N])


@partial(jax.jit, static_argnames=("k", "cell_capacity"))
def knn_grid_hash(query: jnp.ndarray, ref: jnp.ndarray, cell_size: float,
                  ref_mask: jnp.ndarray | None = None, k: int = 1,
                  cell_capacity: int = 32):
    """Voxel-hash KNN: exact within a 3x3x3 cell neighborhood of radius
    ``cell_size`` (points farther than one cell may be missed — callers pick
    cell_size >= expected NN distance). Returns (sq_dist [N,k], idx [N,k]);
    missing neighbors get dist 1e30 / idx -1."""
    M = ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((M,), bool)
    cell = jnp.floor(ref / cell_size).astype(jnp.int32)
    keys = GK.pack(cell, ref_mask)
    order = jnp.argsort(keys)
    skeys = keys[order]

    qcell = jnp.floor(query / cell_size).astype(jnp.int32)
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), -1).reshape(27, 3)
    nkeys = GK.pack(qcell[:, None, :] + offs[None])          # [N, 27]
    starts = jnp.searchsorted(skeys, nkeys)                  # [N, 27]
    slot = jnp.arange(cell_capacity)
    cand_pos = starts[:, :, None] + slot[None, None]         # [N, 27, C]
    cand_pos = jnp.clip(cand_pos, 0, M - 1)
    cand_key = skeys[cand_pos]
    cand_ok = (cand_key == nkeys[:, :, None]) & \
        (cand_key != GK.INVALID_KEY)
    cand_idx = order[cand_pos]                               # [N, 27, C]
    cand_pts = ref[cand_idx.reshape(query.shape[0], -1)]
    d = jnp.sum((cand_pts - query[:, None, :]) ** 2, -1)
    d = jnp.where(cand_ok.reshape(query.shape[0], -1), d, 1e30)
    neg_d, pos = jax.lax.top_k(-d, k)
    idx = jnp.take_along_axis(cand_idx.reshape(query.shape[0], -1), pos, 1)
    idx = jnp.where(-neg_d < 1e29, idx, -1)
    return -neg_d, idx.astype(jnp.int32)


def semantic_from_points(query: jnp.ndarray, ref: jnp.ndarray,
                         ref_semantics: jnp.ndarray,
                         ref_mask: jnp.ndarray | None = None,
                         k: int = 1) -> jnp.ndarray:
    """Nearest-neighbor semantic transfer (color_util.semantic_from_points:
    propagate labels to coarsened/latent grid voxel centers). k=1 copies the
    nearest label; k>1 majority-votes."""
    _, idx = knn_bruteforce(query, ref, ref_mask, k=k)
    labels = ref_semantics[jnp.clip(idx, 0)]
    if k == 1:
        return labels[:, 0]
    num_classes = 32
    votes = jax.nn.one_hot(labels, num_classes).sum(axis=1)
    return jnp.argmax(votes, -1).astype(ref_semantics.dtype)


def latent_semantic_from_grid(fine_grid, fine_semantics: jnp.ndarray,
                              coarse_grid, k: int = 1) -> jnp.ndarray:
    """Per-voxel semantics for a coarse/latent grid by KNN transfer from the
    finest grid's labeled voxel centers (the reference's LATENT_SEMANTIC path,
    base_model.py:674-699 via color_util.semantic_from_points).

    Batch-1 grids; fine_semantics int32[C_fine]. Returns int32[C_coarse]."""
    q = coarse_grid.voxel_centers()[0]
    r = fine_grid.voxel_centers()[0]
    return semantic_from_points(q, r, fine_semantics,
                                ref_mask=fine_grid.mask[0], k=k)


def color_from_points(query: jnp.ndarray, ref: jnp.ndarray,
                      ref_colors: jnp.ndarray,
                      ref_mask: jnp.ndarray | None = None,
                      k: int = 3) -> jnp.ndarray:
    """Inverse-distance-weighted color transfer (color_util.color_from_points)."""
    d, idx = knn_bruteforce(query, ref, ref_mask, k=k)
    w = 1.0 / jnp.maximum(d, 1e-8)
    w = w / jnp.sum(w, -1, keepdims=True)
    cols = ref_colors[jnp.clip(idx, 0)]
    return jnp.sum(w[..., None] * cols, axis=1)
