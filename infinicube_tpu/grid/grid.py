"""The core sparse voxel grid container.

TPU-native replacement for fVDB's ``GridBatch`` (reference: external fvdb wheel,
API census in SURVEY.md §2.5). Instead of a pointer-based VDB tree, a ``Grid``
is a **capacity-padded, sorted-coordinate set**:

- ``ijk``   : int32[B, C, 3] — voxel coordinates, sorted per batch element by
              packed key (lexicographic in i, j, k); padding slots arbitrary.
- ``mask``  : bool[B, C]     — True for active voxels; actives are contiguous
              at the front of each batch row.
- ``keys``  : uint32[B, C]   — cached packed keys; padding = INVALID_KEY, so
              each row is globally sorted ascending.
- ``voxel_size`` : f32[3], ``origin`` : f32[3] — shared across the batch.

All shapes are static (jit-friendly); per-sample voxel counts live in ``mask``.
Per-voxel feature data rides alongside as plain ``[B, C, F]`` arrays (the
``VDBTensor`` analogue is the pair ``(grid, data)`` — see ``nn.vdb.VDBTensor``).

Conventions (match fvdb, per /root/reference/infinicube/utils/fvdb_test.py:78-80):
    grid_coord = (p_world - origin) / voxel_size        (continuous)
    ijk        = round(grid_coord)                      (voxel containing p)
    world      = ijk * voxel_size + origin              (voxel center)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from infinicube_tpu.grid import keys as K


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    ijk: jnp.ndarray          # int32 [B, C, 3]
    mask: jnp.ndarray         # bool  [B, C]
    keys: jnp.ndarray         # uint32[B, C] sorted ascending per row
    voxel_size: jnp.ndarray   # f32 [3]
    origin: jnp.ndarray       # f32 [3]
    # int32[B] voxels dropped by capacity overflow at construction (None for
    # grids not built through grid_from_keys). Overflow silently corrupting
    # outputs is the failure mode; check `overflowed` after building grids
    # whose size isn't statically known (structure decode, world merge).
    num_dropped: jnp.ndarray | None = None

    # ---- shape properties -------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.ijk.shape[0]

    @property
    def capacity(self) -> int:
        return self.ijk.shape[1]

    @property
    def num_voxels(self) -> jnp.ndarray:
        """int32[B] active voxel count per batch element (fvdb num_voxels)."""
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)

    @property
    def total_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.mask).astype(jnp.int32)

    @property
    def overflowed(self) -> jnp.ndarray:
        """bool[B]: True where construction dropped voxels (capacity too
        small). All-False for grids without drop tracking."""
        if self.num_dropped is None:
            return jnp.zeros((self.batch_size,), bool)
        return self.num_dropped > 0

    # ---- coordinate transforms -------------------------------------------
    def world_to_grid(self, points: jnp.ndarray) -> jnp.ndarray:
        """Continuous grid coordinates of world points (..., 3)."""
        return (points - self.origin) / self.voxel_size

    def grid_to_world(self, ijk: jnp.ndarray) -> jnp.ndarray:
        """World-space voxel centers of (possibly fractional) grid coords."""
        return ijk * self.voxel_size + self.origin

    def world_to_ijk(self, points: jnp.ndarray) -> jnp.ndarray:
        """Voxel coordinates containing world points: round(world_to_grid)."""
        return jnp.round(self.world_to_grid(points)).astype(jnp.int32)

    def voxel_centers(self) -> jnp.ndarray:
        """f32[B, C, 3] world centers of all slots (padding included)."""
        return self.grid_to_world(self.ijk.astype(jnp.float32))

    # ---- index queries ----------------------------------------------------
    def ijk_to_index(self, ijk: jnp.ndarray, valid: jnp.ndarray | None = None
                     ) -> jnp.ndarray:
        """fvdb ijk_to_index: per-batch slot index of each query ijk, -1 if
        inactive. ijk: int32[B, N, 3] -> int32[B, N]."""
        qkeys = K.pack(ijk, valid)
        return self.key_to_index(qkeys)

    def key_to_index(self, qkeys: jnp.ndarray) -> jnp.ndarray:
        """Packed-key lookup. qkeys uint32[B, N] -> int32[B, N] (-1 = miss)."""
        def row(row_keys, q):
            pos = jnp.searchsorted(row_keys, q)
            pos_c = jnp.clip(pos, 0, row_keys.shape[0] - 1)
            hit = (row_keys[pos_c] == q) & (q != K.INVALID_KEY)
            return jnp.where(hit, pos_c, -1).astype(jnp.int32)
        return jax.vmap(row)(self.keys, qkeys)

    def points_in_active_voxel(self, points: jnp.ndarray,
                               valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """bool[B, N]: whether each world point lies in an active voxel
        (fvdb points_in_active_voxel, used at voxel_util.py:221)."""
        idx = self.ijk_to_index(self.world_to_ijk(points), valid)
        return idx >= 0

    # ---- convenience ------------------------------------------------------
    def bbox_ijk(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(min_ijk, max_ijk) int32[B, 3] over active voxels (inclusive)."""
        big = jnp.int32(1 << 20)
        m = self.mask[..., None]
        mn = jnp.min(jnp.where(m, self.ijk, big), axis=1)
        mx = jnp.max(jnp.where(m, self.ijk, -big), axis=1)
        return mn, mx

    def replace(self, **kw) -> "Grid":
        return dataclasses.replace(self, **kw)


def make_grid(ijk: jnp.ndarray, mask: jnp.ndarray, voxel_size, origin) -> Grid:
    """Build a Grid from *already sorted, unique* (ijk, mask); recomputes keys.
    Most callers want ``build.grid_from_ijk`` which sorts/uniquifies."""
    voxel_size = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (3,))
    return Grid(ijk=ijk.astype(jnp.int32), mask=mask,
                keys=K.pack(ijk, mask), voxel_size=voxel_size, origin=origin)
