"""Packed spatial keys for the sparse voxel grid.

A voxel coordinate ``ijk`` (int32, per-axis range bounded by a static bit
budget) is packed into a single ``uint32`` sort key. Sorted-key order is
lexicographic in (i, j, k), which gives deterministic voxel ordering and lets
every index query become a binary search (``jnp.searchsorted``).

Bit budget (static): i:11 bits, j:11 bits, k:10 bits -> 32 bits total.
Coordinates are offset so i, j in [-1024, 1024) and k in [-512, 512) pack into
non-negative fields. This covers every crop the reference operates on (finest
crop 256x256x128 at vs=0.2, dense latent 64^3; cf. /root/reference
infinicube/voxelgen/configs/vae_64x64x64_height_down2_vs02_dense_residual.yaml).
Unbounded world accumulation is done host-side in int64 (utils/world_grid).
"""

from __future__ import annotations

import jax.numpy as jnp

I_BITS, J_BITS, K_BITS = 11, 11, 10
I_OFF, J_OFF, K_OFF = 1 << (I_BITS - 1), 1 << (J_BITS - 1), 1 << (K_BITS - 1)
# Largest valid packed key is (2^32 - 2); INVALID_KEY sorts after every valid key.
INVALID_KEY = jnp.uint32(0xFFFFFFFF)

IJK_MIN = (-I_OFF, -J_OFF, -K_OFF)
IJK_MAX = (I_OFF - 1, J_OFF - 1, K_OFF - 1)


def in_domain(ijk: jnp.ndarray) -> jnp.ndarray:
    """Whether each ijk (..., 3) fits the static packing domain."""
    lo = jnp.array(IJK_MIN, dtype=jnp.int32)
    hi = jnp.array(IJK_MAX, dtype=jnp.int32)
    return jnp.all((ijk >= lo) & (ijk <= hi), axis=-1)


def pack(ijk: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pack ijk (..., 3) int32 -> uint32 keys; invalid entries get INVALID_KEY.

    Out-of-domain coordinates are always mapped to INVALID_KEY so they can
    never alias a real voxel.
    """
    ijk = ijk.astype(jnp.int32)
    ok = in_domain(ijk)
    if valid is not None:
        ok = ok & valid
    i = (ijk[..., 0] + I_OFF).astype(jnp.uint32)
    j = (ijk[..., 1] + J_OFF).astype(jnp.uint32)
    k = (ijk[..., 2] + K_OFF).astype(jnp.uint32)
    key = (i << (J_BITS + K_BITS)) | (j << K_BITS) | k
    return jnp.where(ok, key, INVALID_KEY)


def unpack(keys: jnp.ndarray) -> jnp.ndarray:
    """Unpack uint32 keys (...,) -> ijk (..., 3) int32. INVALID_KEY unpacks
    arbitrarily; callers must consult the validity mask."""
    keys = keys.astype(jnp.uint32)
    i = (keys >> (J_BITS + K_BITS)).astype(jnp.int32) - I_OFF
    j = ((keys >> K_BITS) & ((1 << J_BITS) - 1)).astype(jnp.int32) - J_OFF
    k = (keys & ((1 << K_BITS) - 1)).astype(jnp.int32) - K_OFF
    return jnp.stack([i, j, k], axis=-1)
