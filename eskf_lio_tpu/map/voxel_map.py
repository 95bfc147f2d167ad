"""Device-resident voxel map: a sorted voxel dictionary.

TPU-native re-design of the reference `LocalMap`
(`/root/reference/src/LocalMap.cpp`, `include/ESKF_LIO/LocalMap.hpp`).
Per-voxel state matches the reference's `Voxel` (`LocalMap.hpp:63-89`): a
running mean of member points and a running mean of member point
*covariances* (VGICP's per-voxel distribution is the averaged per-point
covariance, not the member scatter — `LocalMap.hpp:84`), with insertion
capped at `max_points_per_voxel` (`LocalMap.hpp:81`).

Layout: instead of a pointer-chasing hash map (reference) or an
open-addressing probe table (both latency-bound on TPU — random gathers
cost ~12 ns/element while sorts/scans run at full throughput), the map is a
KEY-SORTED ARRAY:

* `packed` [C] — voxel keys packed to one int32 relative to a roaming
  `origin`, ascending, INT32_MAX marking empty tail slots;
* payload arrays aligned with it.

Operations become sort/merge dataflow:
* lookup  = vectorised binary search (`searchsorted`) + exact-key check;
* insert  = segment-reduce the batch + one merge sort with the table,
  combining duplicate keys under the reference's running-mean/cap rule;
* evict   = mask + one re-sort (the reference's erase loop,
  `LocalMap.cpp:60-72`), which also re-centres the packing origin on the
  current position — so the 1024-voxel packing span always covers the
  eviction radius with wide margin.

Covariances are stored packed-symmetric ([C, 6]) to halve lookup traffic.
Batch-vs-sequential running-mean semantics: identical to the reference
except when one batch crosses the point cap, where the batch contribution
is scaled proportionally rather than truncated in scan order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.ops import sortmerge as sm
from eskf_lio_tpu.ops import voxel as vx

INT32_MAX = sm.INT32_MAX


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
    """Sorted voxel dictionary.  All payload arrays have leading dim = C."""

    origin: jnp.ndarray  # [3] int32 packing origin (voxel coords)
    packed: jnp.ndarray  # [C] int32 packed keys, ascending, INT32_MAX empty
    keys: jnp.ndarray  # [C, 3] int32 full voxel coords
    count: jnp.ndarray  # [C] float count (capped at max_points_per_voxel)
    mean: jnp.ndarray  # [C, 3] running mean of member points
    cov: jnp.ndarray  # [C, 6] packed running mean of member covariances

    @property
    def capacity(self) -> int:
        return self.packed.shape[0]

    @staticmethod
    def create(capacity: int, dtype=jnp.float32) -> "VoxelMap":
        return VoxelMap(
            origin=jnp.full((3,), -512, jnp.int32),
            packed=jnp.full((capacity,), INT32_MAX, jnp.int32),
            keys=jnp.zeros((capacity, 3), jnp.int32),
            count=jnp.zeros((capacity,), dtype),
            mean=jnp.zeros((capacity, 3), dtype),
            cov=jnp.zeros((capacity, 6), dtype),
        )

    def live(self) -> jnp.ndarray:
        return self.packed != INT32_MAX

    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.live().astype(jnp.int32))


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------


def lookup(
    vmap: VoxelMap,
    points: jnp.ndarray,
    *,
    voxel_size: float,
    max_probe: int = 0,  # kept for API compatibility; unused
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point single-voxel correspondence lookup
    (ref `correspondenceMatching`, `LocalMap.cpp:78-109`: each point reads
    only its own voxel — no neighbourhood search, kept for parity).

    Returns (mean [N,3], cov_packed [N,6], hit [N] bool).
    """
    del max_probe
    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, vmap.origin)
    idx = jnp.searchsorted(vmap.packed, packed, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, vmap.capacity - 1)
    hit = jnp.logical_and(in_range, vmap.packed[idx] == packed)
    return vmap.mean[idx], vmap.cov[idx], hit


# ---------------------------------------------------------------------------
# insert
# ---------------------------------------------------------------------------


def insert(
    vmap: VoxelMap,
    points: jnp.ndarray,
    covs_packed: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    max_points_per_voxel: int,
    max_probe: int = 0,  # kept for API compatibility; unused
) -> tuple[VoxelMap, jnp.ndarray]:
    """Insert a batch of world-frame points + packed covariances.

    Replaces the sequential per-point insert loop (`LocalMap.cpp:47-58`)
    with: segment-reduce the batch per voxel, then ONE merge sort with the
    live table combining duplicates.  Returns (new_map, num_dropped) where
    dropped counts points outside the packing span or beyond capacity.
    """
    del max_probe
    dtype = points.dtype
    n = points.shape[0]
    c = vmap.capacity

    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, vmap.origin)
    ok = jnp.logical_and(valid, in_range)
    dropped_range = jnp.sum(jnp.logical_and(valid, ~in_range).astype(jnp.int32))

    # --- group the batch by voxel (stable sort keeps scan order in ties) --
    order = jnp.argsort(jnp.where(ok, packed, INT32_MAX), stable=True)
    packed_s = packed[order]
    ok_s = ok[order]
    pts_s = points[order]
    covs_s = covs_packed[order]

    head, seg_id = sm.unique_segments(packed_s, ok_s)
    w = ok_s.astype(dtype)
    seg_cnt = jax.ops.segment_sum(w, seg_id, num_segments=n)
    seg_psum = jax.ops.segment_sum(pts_s * w[:, None], seg_id, num_segments=n)
    seg_csum = jax.ops.segment_sum(covs_s * w[:, None], seg_id, num_segments=n)

    # compact heads to the front (ascending packed order preserved)
    pos = jnp.arange(n, dtype=jnp.int32)
    comp = jnp.argsort(jnp.where(head, pos, INT32_MAX), stable=True)
    new_packed = jnp.where(head[comp], packed_s[comp], INT32_MAX)
    new_keys = keys[order][comp]
    seg_of_comp = seg_id[comp]
    new_cnt = seg_cnt[seg_of_comp]
    new_psum = seg_psum[seg_of_comp]
    new_csum = seg_csum[seg_of_comp]

    # --- merge with the live table ----------------------------------------
    # combined rows: old entries carry (count, mean, cov); new entries carry
    # (cnt, psum, csum).  Stable sort on packed keys puts the (unique) old
    # entry immediately before its (unique) new counterpart.
    comb_packed = jnp.concatenate([vmap.packed, new_packed])
    comb_is_old = jnp.concatenate(
        [jnp.ones((c,), bool), jnp.zeros((n,), bool)]
    )
    comb_keys = jnp.concatenate([vmap.keys, new_keys])
    comb_cnt = jnp.concatenate([vmap.count, new_cnt])
    comb_a = jnp.concatenate([vmap.mean, new_psum])  # old: mean, new: psum
    comb_b = jnp.concatenate([vmap.cov, new_csum])  # old: cov,  new: csum

    morder = jnp.argsort(comb_packed, stable=True)
    p_m = comb_packed[morder]
    old_m = comb_is_old[morder]
    keys_m = comb_keys[morder]
    cnt_m = comb_cnt[morder]
    a_m = comb_a[morder]
    b_m = comb_b[morder]

    # previous-row view for duplicate combining
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool), p_m[1:] == p_m[:-1]]
    )
    prev_is_old = jnp.concatenate([jnp.zeros((1,), bool), old_m[:-1]])
    prev_cnt = jnp.concatenate([jnp.zeros((1,), dtype), cnt_m[:-1]])
    prev_a = jnp.concatenate([jnp.zeros((1, 3), dtype), a_m[:-1]])
    prev_b = jnp.concatenate([jnp.zeros((1, 6), dtype), b_m[:-1]])

    is_new = jnp.logical_and(~old_m, p_m != INT32_MAX)
    merged = jnp.logical_and(
        is_new, jnp.logical_and(prev_same, prev_is_old)
    )  # new row absorbing an existing entry

    cap = jnp.asarray(max_points_per_voxel, dtype)
    old_cnt = jnp.where(merged, prev_cnt, 0.0)
    add = cnt_m  # for new rows: batch count
    cap_add = jnp.clip(cap - old_cnt, 0.0, add)
    scale = jnp.where(add > 0, cap_add / jnp.maximum(add, 1.0), 0.0)
    denom = jnp.maximum(old_cnt + cap_add, 1.0)
    base_a = jnp.where(merged[:, None], prev_a * old_cnt[:, None], 0.0)
    base_b = jnp.where(merged[:, None], prev_b * old_cnt[:, None], 0.0)
    out_mean = (base_a + scale[:, None] * a_m) / denom[:, None]
    out_cov = (base_b + scale[:, None] * b_m) / denom[:, None]
    out_cnt = old_cnt + cap_add

    # final row state:
    #   old row with a following new duplicate -> dead (absorbed)
    next_absorbs = jnp.concatenate([merged[1:], jnp.zeros((1,), bool)])
    dead = jnp.logical_and(old_m, next_absorbs)
    live_row = jnp.logical_and(p_m != INT32_MAX, ~dead)
    row_packed = jnp.where(live_row, p_m, INT32_MAX)
    row_cnt = jnp.where(is_new, out_cnt, cnt_m)
    row_mean = jnp.where(is_new[:, None], out_mean, a_m)
    row_cov = jnp.where(is_new[:, None], out_cov, b_m)

    # --- compact back to capacity (live entries ascending, empties last) --
    forder = jnp.argsort(row_packed, stable=True)[:c]
    kept_live = row_packed[forder] != INT32_MAX
    n_live_total = jnp.sum(live_row.astype(jnp.int32))
    overflow = jnp.maximum(n_live_total - jnp.sum(kept_live.astype(jnp.int32)), 0)

    new_map = VoxelMap(
        origin=vmap.origin,
        packed=row_packed[forder],
        keys=keys_m[forder],
        count=row_cnt[forder],
        mean=row_mean[forder],
        cov=row_cov[forder],
    )
    return new_map, dropped_range + overflow


# ---------------------------------------------------------------------------
# eviction + re-centring
# ---------------------------------------------------------------------------


def evict_beyond(
    vmap: VoxelMap,
    center: jnp.ndarray,
    *,
    voxel_size: float,
    distance_threshold: float,
    max_probe: int = 0,  # kept for API compatibility; unused
) -> tuple[VoxelMap, jnp.ndarray]:
    """Drop voxels whose centre is farther than `distance_threshold` from
    `center` (ref `needsPointRemoval`, `LocalMap.cpp:149-154`) and re-centre
    the packing origin on `center`: one mask + one sort.

    Returns (new_map, num_removed).
    """
    del max_probe
    live = vmap.live()
    centers = (vmap.keys.astype(vmap.mean.dtype) + 0.5) * voxel_size
    dist = jnp.linalg.norm(centers - center, axis=-1)
    survive = jnp.logical_and(live, dist <= distance_threshold)
    removed = vmap.num_voxels() - jnp.sum(survive.astype(jnp.int32))

    # re-centre: new origin at the current position voxel minus half-span
    new_origin = vx.voxel_key(center, voxel_size) - 512
    repacked, in_range = sm.pack_keys(vmap.keys, new_origin)
    keep = jnp.logical_and(survive, in_range)
    repacked = jnp.where(keep, repacked, INT32_MAX)

    order = jnp.argsort(repacked, stable=True)
    return (
        VoxelMap(
            origin=new_origin,
            packed=repacked[order],
            keys=vmap.keys[order],
            count=vmap.count[order],
            mean=vmap.mean[order],
            cov=vmap.cov[order],
        ),
        removed,
    )
