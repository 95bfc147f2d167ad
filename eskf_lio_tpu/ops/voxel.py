"""Voxel key primitives.

The reference keys voxels with `floor(p / voxel_size)` into an
`std::unordered_map` (`LocalMap.cpp:114-118`, `LocalMap.hpp:25-26`).  Here
voxel keys index a *sorted* voxel dictionary (`map/voxel_map.py`) via the
order-preserving packing in `ops/sortmerge.py`; this module provides the key
function plus the owner hash that assigns each key to a mesh device in
sharded mode (independent of any layout so shards stay uniformly loaded).
Integer multiply wrap-around is well-defined for jnp int32.
"""

from __future__ import annotations

import jax.numpy as jnp


def voxel_key(points: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """[..., 3] float points -> [..., 3] int32 voxel coordinates
    (ref `getVoxelIndex`, `LocalMap.cpp:114-118`)."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def owner_hash(keys: jnp.ndarray, num_owners: int) -> jnp.ndarray:
    """[..., 3] int32 voxel coords -> owner device index in [0, num_owners)."""
    h = (
        keys[..., 0] * jnp.int32(12582917)
        ^ keys[..., 1] * jnp.int32(3145739)
        ^ keys[..., 2] * jnp.int32(786433)
    )
    h = h ^ (h >> 16)
    h = h * jnp.int32(2654435761 - (1 << 32))
    h = h ^ (h >> 11)
    return (h & jnp.int32(0x7FFFFFFF)) % jnp.int32(num_owners)
