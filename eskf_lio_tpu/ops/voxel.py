"""Voxel hashing primitives.

The reference keys voxels with `floor(p / voxel_size)` into an
`std::unordered_map` (`LocalMap.cpp:114-118`, `LocalMap.hpp:25-26`).  A
pointer-chasing hash map is TPU-hostile, so the map here is a flat
open-addressing table (see `map/voxel_map.py`); this module provides the key
and hash functions shared by the map, the preprocessor's transient scan
table, and the sharded-map owner assignment.

Two independent 32-bit mixes are used:
* `slot_hash`   — position within a table (linear probing).
* `owner_hash`  — which mesh device owns a key (sharded mode); independent
  from `slot_hash` so per-device sub-tables stay uniformly loaded.
Integer multiply wrap-around is well-defined for jnp int32.
"""

from __future__ import annotations

import jax.numpy as jnp

# Classic 3D spatial-hash primes (Teschner et al.), also used by Open3D's
# hash_eigen that the reference relies on.
_PX = jnp.int32(73856093)
_PY = jnp.int32(19349669)
_PZ = jnp.int32(83492791)
_MIX = jnp.int32(0x9E3779B1 - (1 << 32))  # golden-ratio odd constant as int32


def voxel_key(points: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """[N, 3] float points -> [N, 3] int32 voxel coordinates
    (ref `getVoxelIndex`, `LocalMap.cpp:114-118`)."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def slot_hash(keys: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] int32 voxel coords -> int32 hash for table slots."""
    h = keys[..., 0] * _PX ^ keys[..., 1] * _PY ^ keys[..., 2] * _PZ
    # extra avalanche: xorshift-multiply
    h = h ^ (h >> 15)
    h = h * _MIX
    h = h ^ (h >> 13)
    return h


def owner_hash(keys: jnp.ndarray, num_owners: int) -> jnp.ndarray:
    """[..., 3] int32 voxel coords -> owner index in [0, num_owners).

    Independent mix from `slot_hash` so sharding does not correlate with
    probe position."""
    h = (
        keys[..., 0] * jnp.int32(12582917)
        ^ keys[..., 1] * jnp.int32(3145739)
        ^ keys[..., 2] * jnp.int32(786433)
    )
    h = h ^ (h >> 16)
    h = h * jnp.int32(2654435761 - (1 << 32))
    h = h ^ (h >> 11)
    return (h & jnp.int32(0x7FFFFFFF)) % jnp.int32(num_owners)


def keys_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise voxel-key equality over the last axis."""
    return jnp.all(a == b, axis=-1)
