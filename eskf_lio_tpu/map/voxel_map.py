"""Device-resident voxel-hash local map.

TPU-native re-design of the reference `LocalMap`
(`/root/reference/src/LocalMap.cpp`, `include/ESKF_LIO/LocalMap.hpp`): an
open-addressing hash table of static capacity living entirely in device
memory as a pytree of flat arrays.  Per-voxel state matches the reference's
`Voxel` (`LocalMap.hpp:63-89`): a running mean of member points and a running
mean of member point *covariances* (VGICP's per-voxel distribution is the
averaged per-point covariance, not the scatter of members — `LocalMap.hpp:84`),
with insertion capped at `max_points_per_voxel` (`LocalMap.hpp:81`).

Covariances are stored packed-symmetric ([C, 6]: xx, xy, xz, yy, yz, zz) to
halve HBM traffic on the lookup path.

Design differences from the reference, all deliberate:
* Batched parallel insert: points are grouped per voxel by a sort +
  segment-reduce, then unique voxels claim slots via contended scatter-min
  rounds (deterministic; no mutexes).  The reference inserts sequentially
  (`LocalMap.cpp:47-58`).
* Running means are updated per batch, arithmetically identical to the
  reference's one-at-a-time update except when a batch crosses the
  1000-point cap, where the batch contribution is scaled proportionally
  instead of truncating to the first points in scan order.
* Eviction (`LocalMap.cpp:60-72`) rebuilds the table from surviving voxels
  (open addressing cannot tombstone-free delete mid-chain); keyed on sensor
  time by the caller, not wall clock (reference quirk, `LocalMap.cpp:60`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.ops import voxel as vx
from eskf_lio_tpu.ops.hash_table import find_or_alloc as _find_or_alloc
from eskf_lio_tpu.ops.hash_table import probe_lookup as _probe_lookup

_INT_MAX = jnp.int32(2147483647)


def pack_cov(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
            cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_cov(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


class VoxelMap(NamedTuple):
    """Open-addressing voxel table.  All arrays have leading dim = capacity."""

    keys: jnp.ndarray  # [C, 3] int32 voxel coords
    occupied: jnp.ndarray  # [C] bool
    count: jnp.ndarray  # [C] int32, capped at max_points_per_voxel
    mean: jnp.ndarray  # [C, 3] running mean of member points
    cov: jnp.ndarray  # [C, 6] packed running mean of member covariances

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @staticmethod
    def create(capacity: int, dtype=jnp.float32) -> "VoxelMap":
        return VoxelMap(
            keys=jnp.zeros((capacity, 3), jnp.int32),
            occupied=jnp.zeros((capacity,), bool),
            count=jnp.zeros((capacity,), jnp.int32),
            mean=jnp.zeros((capacity, 3), dtype),
            cov=jnp.zeros((capacity, 6), dtype),
        )

    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.occupied.astype(jnp.int32))


# ---------------------------------------------------------------------------
# batched insert
# ---------------------------------------------------------------------------


def insert(
    vmap: VoxelMap,
    points: jnp.ndarray,
    covs_packed: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    max_points_per_voxel: int,
    max_probe: int,
) -> tuple[VoxelMap, jnp.ndarray]:
    """Insert a batch of world-frame points + packed covariances.

    Replaces the sequential per-point `LocalMap::updateLocalMap` insert loop
    (`LocalMap.cpp:47-58`).  Returns (new_map, num_dropped) where dropped
    counts points whose voxel could not be resolved within the probe bound
    (table overloaded — size the capacity to avoid this).
    """
    n = points.shape[0]
    keys = vx.voxel_key(points, voxel_size)

    # --- group same-voxel points via sort by slot-hash --------------------
    h = vx.slot_hash(keys)
    sort_key = jnp.where(valid, h, _INT_MAX)
    order = jnp.argsort(sort_key, stable=True)
    keys_s = keys[order]
    pts_s = points[order]
    covs_s = covs_packed[order]
    valid_s = valid[order]

    same_as_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), vx.keys_equal(keys_s[1:], keys_s[:-1])]
    )
    head = jnp.logical_and(valid_s, ~same_as_prev)
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1  # [-1 for pre-head pad]
    seg_id = jnp.where(valid_s, seg_id, n - 1)  # invalid -> last segment bin

    w = valid_s.astype(points.dtype)
    seg_count = jax.ops.segment_sum(w, seg_id, num_segments=n)
    seg_psum = jax.ops.segment_sum(pts_s * w[:, None], seg_id, num_segments=n)
    seg_csum = jax.ops.segment_sum(covs_s * w[:, None], seg_id, num_segments=n)

    # segment representative keys: gather at head positions
    head_idx = jnp.where(head, jnp.arange(n), n - 1)
    # compact heads to the front of a length-n array of segment slots
    seg_order = jnp.argsort(jnp.where(head, jnp.arange(n), _INT_MAX), stable=True)
    head_pos = seg_order  # position in sorted arrays of each segment's head
    seg_keys = keys_s[head_pos]
    seg_valid = head[head_pos]
    del head_idx

    # --- resolve/allocate slots ------------------------------------------
    table_keys, occupied, slot = _find_or_alloc(
        vmap.keys, vmap.occupied, seg_keys, seg_valid, max_probe
    )
    resolved = jnp.logical_and(seg_valid, slot >= 0)
    slot_safe = jnp.where(resolved, slot, 0)

    # segment stats, in segment order (segment i corresponds to seg_id i)
    seg_i = jnp.arange(n)
    cnt = seg_count[seg_i]
    psum = seg_psum[seg_i]
    csum = seg_csum[seg_i]

    # --- per-slot accumulation with cap semantics -------------------------
    zeros_f = jnp.zeros((vmap.capacity,), points.dtype)
    add_cnt = zeros_f.at[slot_safe].add(jnp.where(resolved, cnt, 0.0))
    add_p = (
        jnp.zeros_like(vmap.mean)
        .at[slot_safe]
        .add(jnp.where(resolved[:, None], psum, 0.0))
    )
    add_c = (
        jnp.zeros_like(vmap.cov)
        .at[slot_safe]
        .add(jnp.where(resolved[:, None], csum, 0.0))
    )

    old_cnt = vmap.count.astype(points.dtype)
    cap = jnp.asarray(max_points_per_voxel, points.dtype)
    cap_add = jnp.clip(cap - old_cnt, 0.0, add_cnt)
    scale = jnp.where(add_cnt > 0, cap_add / jnp.maximum(add_cnt, 1.0), 0.0)
    denom = jnp.maximum(old_cnt + cap_add, 1.0)

    new_mean = (old_cnt[:, None] * vmap.mean + scale[:, None] * add_p) / denom[
        :, None
    ]
    new_cov = (old_cnt[:, None] * vmap.cov + scale[:, None] * add_c) / denom[
        :, None
    ]
    touched = add_cnt > 0
    new_map = VoxelMap(
        keys=table_keys,
        occupied=occupied,
        count=jnp.where(
            touched, (old_cnt + cap_add).astype(jnp.int32), vmap.count
        ),
        mean=jnp.where(touched[:, None], new_mean, vmap.mean),
        cov=jnp.where(touched[:, None], new_cov, vmap.cov),
    )
    dropped = jnp.sum(
        jnp.where(jnp.logical_and(seg_valid, ~resolved), cnt, 0.0)
    ).astype(jnp.int32)
    return new_map, dropped


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------


def lookup(
    vmap: VoxelMap,
    points: jnp.ndarray,
    *,
    voxel_size: float,
    max_probe: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point single-voxel correspondence lookup
    (ref `correspondenceMatching`, `LocalMap.cpp:78-109`: each point probes
    only its own voxel — no neighbourhood search, kept for parity).

    Returns (mean [N,3], cov_packed [N,6], hit [N] bool).
    """
    keys = vx.voxel_key(points, voxel_size)
    found_slot, hit = _probe_lookup(vmap.keys, vmap.occupied, keys, max_probe)
    return vmap.mean[found_slot], vmap.cov[found_slot], hit


# ---------------------------------------------------------------------------
# eviction (rebuild)
# ---------------------------------------------------------------------------


def evict_beyond(
    vmap: VoxelMap,
    center: jnp.ndarray,
    *,
    voxel_size: float,
    distance_threshold: float,
    max_probe: int,
) -> tuple[VoxelMap, jnp.ndarray]:
    """Drop voxels whose center is farther than `distance_threshold` from
    `center` (ref `needsPointRemoval`, `LocalMap.cpp:149-154`), rebuilding
    the open-addressing table from the survivors.

    Returns (new_map, num_removed).
    """
    centers = (vmap.keys.astype(vmap.mean.dtype) + 0.5) * voxel_size
    dist = jnp.linalg.norm(centers - center, axis=-1)
    survive = jnp.logical_and(vmap.occupied, dist <= distance_threshold)
    removed = vmap.num_voxels() - jnp.sum(survive.astype(jnp.int32))

    fresh = VoxelMap.create(vmap.capacity, vmap.mean.dtype)
    table_keys, occupied, slot = _find_or_alloc(
        fresh.keys, fresh.occupied, vmap.keys, survive, max_probe
    )
    ok = jnp.logical_and(survive, slot >= 0)
    idx = jnp.where(ok, slot, vmap.capacity)  # OOB -> dropped
    new_map = VoxelMap(
        keys=table_keys,
        occupied=occupied,
        count=fresh.count.at[idx].set(vmap.count, mode="drop"),
        mean=fresh.mean.at[idx].set(vmap.mean, mode="drop"),
        cov=fresh.cov.at[idx].set(vmap.cov, mode="drop"),
    )
    return new_map, removed
