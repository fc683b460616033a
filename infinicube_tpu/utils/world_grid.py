"""Host-side unbounded world voxel grid (int64 keys, NumPy).

The device grid core (infinicube_tpu.grid) is capacity-padded and bounded by
a 2048x2048x1024 packing domain per chunk — the right trade for jit. The
*unbounded* accumulated world (trajectory/blocks modes append chunk after
chunk, reference voxel_world_generation.py:827-832 merge_grid2_to_grid1 and
voxel_util.py:191-245) lives host-side as a sorted-int64-key NumPy set, with
the same round() voxelization convention. Also hosts connected-component
filtering (scipy csgraph over the 6-neighborhood, reference
fvdb_utils.cc_removal_func:32-68 / voxel_util.py:973-1097) and rigid grid
warping (voxel_util.transform_grid_and_semantic, extrap_util.py:233)."""

from __future__ import annotations

import numpy as np

_B = 21  # bits per axis; domain +-2^20 voxels per axis


def pack64(ijk: np.ndarray) -> np.ndarray:
    off = 1 << (_B - 1)
    i = ijk[:, 0].astype(np.int64) + off
    j = ijk[:, 1].astype(np.int64) + off
    k = ijk[:, 2].astype(np.int64) + off
    return (i << (2 * _B)) | (j << _B) | k


def unpack64(keys: np.ndarray) -> np.ndarray:
    off = 1 << (_B - 1)
    mask = (1 << _B) - 1
    i = (keys >> (2 * _B)) - off
    j = ((keys >> _B) & mask) - off
    k = (keys & mask) - off
    return np.stack([i, j, k], axis=-1).astype(np.int64)


class WorldGrid:
    """Accumulating semantic voxel world at a fixed voxel size/origin."""

    def __init__(self, voxel_size, origin=None):
        self.voxel_size = np.broadcast_to(np.asarray(voxel_size, np.float64),
                                          (3,)).copy()
        self.origin = (np.broadcast_to(np.asarray(origin, np.float64), (3,))
                       .copy() if origin is not None else self.voxel_size / 2)
        self.keys = np.zeros((0,), np.int64)
        self.semantics = np.zeros((0,), np.int32)

    # ---- conversions -------------------------------------------------------
    def world_to_ijk(self, points: np.ndarray) -> np.ndarray:
        return np.round((points - self.origin) / self.voxel_size).astype(np.int64)

    def ijk_to_world(self, ijk: np.ndarray) -> np.ndarray:
        return ijk * self.voxel_size + self.origin

    @property
    def num_voxels(self) -> int:
        return len(self.keys)

    def points(self) -> np.ndarray:
        return self.ijk_to_world(unpack64(self.keys))

    def ijk(self) -> np.ndarray:
        return unpack64(self.keys)

    # ---- merging (merge_grid2_to_grid1 semantics: grid1 wins overlaps) -----
    def merge_ijk(self, ijk: np.ndarray, semantics: np.ndarray,
                  keep_existing: bool = True):
        new_keys = pack64(np.asarray(ijk))
        new_sem = np.asarray(semantics, np.int32)
        # dedup new
        new_keys, first = np.unique(new_keys, return_index=True)
        new_sem = new_sem[first]
        if keep_existing:
            fresh = ~np.isin(new_keys, self.keys, assume_unique=True)
            new_keys, new_sem = new_keys[fresh], new_sem[fresh]
            keys = np.concatenate([self.keys, new_keys])
            sems = np.concatenate([self.semantics, new_sem])
        else:
            stale = ~np.isin(self.keys, new_keys, assume_unique=True)
            keys = np.concatenate([self.keys[stale], new_keys])
            sems = np.concatenate([self.semantics[stale], new_sem])
        order = np.argsort(keys)
        self.keys, self.semantics = keys[order], sems[order]

    def merge_points(self, points: np.ndarray, semantics: np.ndarray,
                     keep_existing: bool = True):
        self.merge_ijk(self.world_to_ijk(points), semantics, keep_existing)

    def crop(self, bbox_min, bbox_max):
        """Return (ijk, semantics) of voxels with centers in the world AABB."""
        pts = self.points()
        m = np.all((pts >= np.asarray(bbox_min)) &
                   (pts <= np.asarray(bbox_max)), axis=-1)
        return unpack64(self.keys[m]), self.semantics[m]

    def occupancy_in(self, bbox_min, bbox_max):
        """bool: does the AABB contain any voxel (blocks-mode skip-empty)."""
        ijk, _ = self.crop(bbox_min, bbox_max)
        return len(ijk) > 0


def transform_ijk(ijk: np.ndarray, transform: np.ndarray, voxel_size,
                  origin) -> np.ndarray:
    """Rigidly warp voxel coordinates: ijk -> world -> T -> ijk (the chunk
    warp of voxel_util.transform_grid_and_semantic)."""
    vs = np.asarray(voxel_size, np.float64)
    org = np.asarray(origin, np.float64)
    world = ijk * vs + org
    warped = world @ np.asarray(transform)[:3, :3].T + transform[:3, 3]
    return np.round((warped - org) / vs).astype(np.int64)


def connected_component_filter(ijk: np.ndarray, min_size: int = 10,
                               keep_largest: bool = False) -> np.ndarray:
    """bool[N] keep-mask: remove connected components (6-neighborhood)
    smaller than min_size (reference cc_removal_func)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(ijk)
    if n == 0:
        return np.zeros((0,), bool)
    keys = pack64(ijk)
    order = np.argsort(keys)
    skeys = keys[order]
    rows, cols = [], []
    for axis, shift in ((0, 1 << (2 * _B)), (1, 1 << _B), (2, 1)):
        nb = skeys + shift
        pos = np.searchsorted(skeys, nb)
        pos_c = np.clip(pos, 0, n - 1)
        hit = skeys[pos_c] == nb
        rows.append(order[np.nonzero(hit)[0]])
        cols.append(order[pos_c[hit]])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    ncomp, labels = connected_components(adj, directed=False)
    sizes = np.bincount(labels, minlength=ncomp)
    if keep_largest:
        return labels == np.argmax(sizes)
    return sizes[labels] >= min_size
