"""Device-resident voxel map: a two-tier sorted voxel dictionary (LSM).

TPU-native re-design of the reference `LocalMap`
(`/root/reference/src/LocalMap.cpp`, `include/ESKF_LIO/LocalMap.hpp`).
Per-voxel state matches the reference's `Voxel` (`LocalMap.hpp:63-89`): a
running mean of member points and a running mean of member point
*covariances* (VGICP's per-voxel distribution is the averaged per-point
covariance, not the member scatter — `LocalMap.hpp:84`), capped at
`max_points_per_voxel` points (`LocalMap.hpp:81`).

Layout — chosen from measured TPU behaviour (random gathers are
latency-bound at ~12 ns/element; sorts/scans run at full throughput):

* MAIN tier: key-sorted arrays of capacity C (packed int32 keys relative to
  a roaming `origin`, INT32_MAX = empty tail) holding finalised running
  stats (count, mean, cov).
* DELTA tier: a small key-sorted buffer of capacity D holding *raw sums*
  (count, Σp, Σcov) of recent insertions — the LSM memtable.

Operations:
* lookup — two vectorised binary searches (main + delta) and an on-the-fly
  combine under the reference's running-mean/cap rule;
* insert — segment-reduce the batch, one merge sort against the DELTA only
  (O(N + D) per scan, independent of map size); when the merged delta
  overflows, a `lax.cond` compaction folds it into MAIN (O(C), amortised
  over many scans — the LSM flush);
* evict — compact + mask + one re-sort (ref `LocalMap.cpp:60-72`), which
  also re-centres the packing origin so the 1024-voxel span always covers
  the eviction radius.

Covariances are stored packed-symmetric ([*, 6]).  Semantics vs the
sequential reference: identical below the point cap; a batch crossing the
cap contributes proportionally rather than by scan-order truncation, and
delta sums are capped at read/compaction time rather than per batch.
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
    """Two-tier sorted voxel dictionary."""

    origin: jnp.ndarray  # [3] int32 packing origin (voxel coords)
    # main tier (finalised stats)
    packed: jnp.ndarray  # [C] int32 ascending, INT32_MAX empty
    keys: jnp.ndarray  # [C, 3]
    count: jnp.ndarray  # [C] float, capped
    mean: jnp.ndarray  # [C, 3]
    cov: jnp.ndarray  # [C, 6]
    # delta tier (raw sums)
    d_packed: jnp.ndarray  # [D] int32 ascending, INT32_MAX empty
    d_keys: jnp.ndarray  # [D, 3]
    d_cnt: jnp.ndarray  # [D] float raw count
    d_psum: jnp.ndarray  # [D, 3] raw Σ point
    d_csum: jnp.ndarray  # [D, 6] raw Σ cov

    @property
    def capacity(self) -> int:
        return self.packed.shape[0]

    @property
    def delta_capacity(self) -> int:
        return self.d_packed.shape[0]

    @staticmethod
    def create(
        capacity: int, delta_capacity: int | None = None, dtype=jnp.float32
    ) -> "VoxelMap":
        d = delta_capacity if delta_capacity is not None else max(
            capacity // 8, 1024
        )
        return VoxelMap(
            origin=jnp.full((3,), -512, jnp.int32),
            packed=jnp.full((capacity,), INT32_MAX, jnp.int32),
            keys=jnp.zeros((capacity, 3), jnp.int32),
            count=jnp.zeros((capacity,), dtype),
            mean=jnp.zeros((capacity, 3), dtype),
            cov=jnp.zeros((capacity, 6), dtype),
            d_packed=jnp.full((d,), INT32_MAX, jnp.int32),
            d_keys=jnp.zeros((d, 3), jnp.int32),
            d_cnt=jnp.zeros((d,), dtype),
            d_psum=jnp.zeros((d, 3), dtype),
            d_csum=jnp.zeros((d, 6), dtype),
        )

    def live(self) -> jnp.ndarray:
        """Main-tier liveness mask (delta excluded)."""
        return self.packed != INT32_MAX

    def num_voxels(self) -> jnp.ndarray:
        """Distinct voxels across both tiers."""
        n_main = jnp.sum(self.live().astype(jnp.int32))
        d_live = self.d_packed != INT32_MAX
        idx = jnp.searchsorted(self.packed, self.d_packed).astype(jnp.int32)
        idx = jnp.minimum(idx, self.capacity - 1)
        in_main = self.packed[idx] == self.d_packed
        n_delta_only = jnp.sum(
            jnp.logical_and(d_live, ~in_main).astype(jnp.int32)
        )
        return n_main + n_delta_only


def _combine(c_main, mean_main, cov_main, c_add, psum, csum, cap):
    """Running-mean update of (count, mean, cov) with `c_add` raw-sum points,
    capped at `cap` (ref `Voxel::addPoint`, `LocalMap.hpp:79-87`; batch form
    scales the contribution when crossing the cap)."""
    cap_add = jnp.clip(cap - c_main, 0.0, c_add)
    scale = jnp.where(c_add > 0, cap_add / jnp.maximum(c_add, 1.0), 0.0)
    denom = jnp.maximum(c_main + cap_add, 1.0)
    mean = (c_main[..., None] * mean_main + scale[..., None] * psum) / denom[
        ..., None
    ]
    cov = (c_main[..., None] * cov_main + scale[..., None] * csum) / denom[
        ..., None
    ]
    return c_main + cap_add, mean, cov


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------


def lookup(
    vmap: VoxelMap,
    points: jnp.ndarray,
    *,
    voxel_size: float,
    max_points_per_voxel: int = 1000,
    max_probe: int = 0,  # kept for API compatibility; unused
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point single-voxel correspondence lookup
    (ref `correspondenceMatching`, `LocalMap.cpp:78-109`: each point reads
    only its own voxel — no neighbourhood search, kept for parity).

    Returns (mean [N,3], cov_packed [N,6], hit [N] bool), combining the
    main entry with any pending delta sums for the same voxel.
    """
    del max_probe
    dtype = vmap.mean.dtype
    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, vmap.origin)

    mi = jnp.searchsorted(vmap.packed, packed).astype(jnp.int32)
    mi = jnp.minimum(mi, vmap.capacity - 1)
    m_hit = jnp.logical_and(in_range, vmap.packed[mi] == packed)

    di = jnp.searchsorted(vmap.d_packed, packed).astype(jnp.int32)
    di = jnp.minimum(di, vmap.delta_capacity - 1)
    d_hit = jnp.logical_and(in_range, vmap.d_packed[di] == packed)

    c_main = jnp.where(m_hit, vmap.count[mi], 0.0)
    mean_m = jnp.where(m_hit[:, None], vmap.mean[mi], 0.0)
    cov_m = jnp.where(m_hit[:, None], vmap.cov[mi], 0.0)
    c_add = jnp.where(d_hit, vmap.d_cnt[di], 0.0)
    psum = jnp.where(d_hit[:, None], vmap.d_psum[di], 0.0)
    csum = jnp.where(d_hit[:, None], vmap.d_csum[di], 0.0)

    cap = jnp.asarray(max_points_per_voxel, dtype)
    _, mean, cov = _combine(c_main, mean_m, cov_m, c_add, psum, csum, cap)
    return mean, cov, jnp.logical_or(m_hit, d_hit)


# ---------------------------------------------------------------------------
# insert (delta merge + conditional compaction)
# ---------------------------------------------------------------------------


def _merge_delta(vmap: VoxelMap, new_packed, new_keys, new_cnt, new_psum,
                 new_csum, cap):
    """Merge sorted new raw-sum entries [N] into the delta tier.

    Returns the merged candidate arrays of length D+N (sorted, duplicates
    combined under the point cap, dead rows = INT32_MAX) plus the live
    count.  Sums are capped here as well as at read so a voxel that
    saturates within one delta epoch stops accumulating, matching the
    reference's `numPoints < maxNumPoints` gate (`LocalMap.hpp:81`) up to
    the proportional batch-crossing rule."""
    d = vmap.delta_capacity
    n = new_packed.shape[0]

    comb_packed = jnp.concatenate([vmap.d_packed, new_packed])
    comb_keys = jnp.concatenate([vmap.d_keys, new_keys])
    comb_cnt = jnp.concatenate([vmap.d_cnt, new_cnt])
    comb_psum = jnp.concatenate([vmap.d_psum, new_psum])
    comb_csum = jnp.concatenate([vmap.d_csum, new_csum])

    order = jnp.argsort(comb_packed, stable=True)
    p = comb_packed[order]
    k = comb_keys[order]
    c = comb_cnt[order]
    ps = comb_psum[order]
    cs = comb_csum[order]

    # duplicates are adjacent (each side is deduped): later row absorbs,
    # capped — prior sums take precedence (they arrived first)
    prev_same = jnp.concatenate([jnp.zeros((1,), bool), p[1:] == p[:-1]])
    next_same = jnp.concatenate([prev_same[1:], jnp.zeros((1,), bool)])
    c_prev = jnp.where(
        prev_same, jnp.concatenate([jnp.zeros((1,), c.dtype), c[:-1]]), 0.0
    )
    ps_prev = jnp.where(
        prev_same[:, None],
        jnp.concatenate([jnp.zeros((1, 3), ps.dtype), ps[:-1]]),
        0.0,
    )
    cs_prev = jnp.where(
        prev_same[:, None],
        jnp.concatenate([jnp.zeros((1, 6), cs.dtype), cs[:-1]]),
        0.0,
    )
    cap_add = jnp.clip(cap - c_prev, 0.0, c)
    scale = jnp.where(c > 0, cap_add / jnp.maximum(c, 1.0), 0.0)
    c_out = c_prev + cap_add
    ps_out = ps_prev + scale[:, None] * ps
    cs_out = cs_prev + scale[:, None] * cs
    # first row of a duplicate pair dies
    p_out = jnp.where(next_same, INT32_MAX, p)
    live = jnp.sum((p_out != INT32_MAX).astype(jnp.int32))
    # recompact: live ascending, dead/empty at the end
    forder = jnp.argsort(p_out, stable=True)
    return (
        p_out[forder], k[forder], c_out[forder], ps_out[forder],
        cs_out[forder], live,
    )


def _compact_into_main(vmap: VoxelMap, dp, dk, dc, dps, dcs, cap):
    """LSM flush: fold sorted raw-sum entries [L] into the main tier.
    Returns (main arrays [C], overflow count)."""
    c_cap = vmap.capacity
    comb_packed = jnp.concatenate([vmap.packed, dp])
    comb_keys = jnp.concatenate([vmap.keys, dk])
    is_old = jnp.concatenate(
        [jnp.ones((c_cap,), bool), jnp.zeros((dp.shape[0],), bool)]
    )
    comb_cnt = jnp.concatenate([vmap.count, dc])
    comb_a = jnp.concatenate([vmap.mean, dps])
    comb_b = jnp.concatenate([vmap.cov, dcs])

    order = jnp.argsort(comb_packed, stable=True)
    p = comb_packed[order]
    old = is_old[order]
    k = comb_keys[order]
    cnt = comb_cnt[order]
    a = comb_a[order]
    b = comb_b[order]

    prev_same = jnp.concatenate([jnp.zeros((1,), bool), p[1:] == p[:-1]])
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), old[:-1]])
    prev_cnt = jnp.concatenate([jnp.zeros((1,), cnt.dtype), cnt[:-1]])
    prev_a = jnp.concatenate([jnp.zeros((1, 3), a.dtype), a[:-1]])
    prev_b = jnp.concatenate([jnp.zeros((1, 6), b.dtype), b[:-1]])

    is_new = jnp.logical_and(~old, p != INT32_MAX)
    merged = jnp.logical_and(is_new, jnp.logical_and(prev_same, prev_old))

    c_main = jnp.where(merged, prev_cnt, 0.0)
    mean_m = jnp.where(merged[:, None], prev_a, 0.0)
    cov_m = jnp.where(merged[:, None], prev_b, 0.0)
    out_cnt, out_mean, out_cov = _combine(c_main, mean_m, cov_m, cnt, a, b, cap)

    next_absorbs = jnp.concatenate([merged[1:], jnp.zeros((1,), bool)])
    dead = jnp.logical_and(old, next_absorbs)
    row_packed = jnp.where(
        jnp.logical_and(p != INT32_MAX, ~dead), p, INT32_MAX
    )
    row_cnt = jnp.where(is_new, out_cnt, cnt)
    row_mean = jnp.where(is_new[:, None], out_mean, a)
    row_cov = jnp.where(is_new[:, None], out_cov, b)

    forder = jnp.argsort(row_packed, stable=True)[:c_cap]
    kept = row_packed[forder] != INT32_MAX
    n_live = jnp.sum((row_packed != INT32_MAX).astype(jnp.int32))
    overflow = jnp.maximum(n_live - jnp.sum(kept.astype(jnp.int32)), 0)
    return (
        row_packed[forder], k[forder], row_cnt[forder], row_mean[forder],
        row_cov[forder], overflow,
    )


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

    Replaces the sequential per-point insert loop (`LocalMap.cpp:47-58`):
    segment-reduce the batch per voxel, merge the raw sums into the DELTA
    tier (O(N+D) — map-size independent), compacting into MAIN only when
    the delta overflows.  Returns (new_map, num_dropped)."""
    del max_probe
    dtype = points.dtype
    n = points.shape[0]
    d_cap = vmap.delta_capacity
    cap = jnp.asarray(max_points_per_voxel, dtype)

    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, vmap.origin)
    ok = jnp.logical_and(valid, in_range)
    dropped_range = jnp.sum(
        jnp.logical_and(valid, ~in_range).astype(jnp.int32)
    )

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

    pos = jnp.arange(n, dtype=jnp.int32)
    comp = jnp.argsort(jnp.where(head, pos, INT32_MAX), stable=True)
    new_packed = jnp.where(head[comp], packed_s[comp], INT32_MAX)
    new_keys = keys[order][comp]
    seg_of = seg_id[comp]
    new_cnt = jnp.where(head[comp], seg_cnt[seg_of], 0.0)
    new_psum = jnp.where(head[comp][:, None], seg_psum[seg_of], 0.0)
    new_csum = jnp.where(head[comp][:, None], seg_csum[seg_of], 0.0)

    dp, dk, dc, dps, dcs, d_live = _merge_delta(
        vmap, new_packed, new_keys, new_cnt, new_psum, new_csum, cap
    )

    def no_compact(_):
        return (
            vmap.packed, vmap.keys, vmap.count, vmap.mean, vmap.cov,
            dp[:d_cap], dk[:d_cap], dc[:d_cap], dps[:d_cap], dcs[:d_cap],
            jnp.asarray(0, jnp.int32),
        )

    def compact(_):
        m_packed, m_keys, m_cnt, m_mean, m_cov, overflow = _compact_into_main(
            vmap, dp, dk, dc, dps, dcs, cap
        )
        return (
            m_packed, m_keys, m_cnt, m_mean, m_cov,
            jnp.full((d_cap,), INT32_MAX, jnp.int32),
            jnp.zeros((d_cap, 3), jnp.int32),
            jnp.zeros((d_cap,), dtype),
            jnp.zeros((d_cap, 3), dtype),
            jnp.zeros((d_cap, 6), dtype),
            overflow,
        )

    (
        m_packed, m_keys, m_cnt, m_mean, m_cov,
        o_dp, o_dk, o_dc, o_dps, o_dcs, overflow,
    ) = jax.lax.cond(d_live <= d_cap, no_compact, compact, None)

    new_map = VoxelMap(
        origin=vmap.origin,
        packed=m_packed, keys=m_keys, count=m_cnt, mean=m_mean, cov=m_cov,
        d_packed=o_dp, d_keys=o_dk, d_cnt=o_dc, d_psum=o_dps, d_csum=o_dcs,
    )
    return new_map, dropped_range + overflow


# ---------------------------------------------------------------------------
# compaction / eviction
# ---------------------------------------------------------------------------


def compact(
    vmap: VoxelMap, *, max_points_per_voxel: int
) -> tuple[VoxelMap, jnp.ndarray]:
    """Force the LSM flush (delta -> main).  Used before export/eviction."""
    cap = jnp.asarray(max_points_per_voxel, vmap.mean.dtype)
    m_packed, m_keys, m_cnt, m_mean, m_cov, overflow = _compact_into_main(
        vmap, vmap.d_packed, vmap.d_keys, vmap.d_cnt, vmap.d_psum,
        vmap.d_csum, cap,
    )
    d_cap = vmap.delta_capacity
    dtype = vmap.mean.dtype
    return (
        VoxelMap(
            origin=vmap.origin,
            packed=m_packed, keys=m_keys, count=m_cnt, mean=m_mean,
            cov=m_cov,
            d_packed=jnp.full((d_cap,), INT32_MAX, jnp.int32),
            d_keys=jnp.zeros((d_cap, 3), jnp.int32),
            d_cnt=jnp.zeros((d_cap,), dtype),
            d_psum=jnp.zeros((d_cap, 3), dtype),
            d_csum=jnp.zeros((d_cap, 6), dtype),
        ),
        overflow,
    )


def evict_beyond(
    vmap: VoxelMap,
    center: jnp.ndarray,
    *,
    voxel_size: float,
    distance_threshold: float,
    max_points_per_voxel: int = 1000,
    max_probe: int = 0,  # kept for API compatibility; unused
) -> tuple[VoxelMap, jnp.ndarray]:
    """Drop voxels farther than `distance_threshold` from `center`
    (ref `needsPointRemoval`, `LocalMap.cpp:149-154`), after folding the
    delta in; re-centres the packing origin on `center`.

    Returns (new_map, num_removed)."""
    del max_probe
    vmap, _ = compact(vmap, max_points_per_voxel=max_points_per_voxel)
    live = vmap.live()
    centers = (vmap.keys.astype(vmap.mean.dtype) + 0.5) * voxel_size
    dist = jnp.linalg.norm(centers - center, axis=-1)
    survive = jnp.logical_and(live, dist <= distance_threshold)
    removed = jnp.sum(live.astype(jnp.int32)) - jnp.sum(
        survive.astype(jnp.int32)
    )

    new_origin = vx.voxel_key(center, voxel_size) - 512
    repacked, in_range = sm.pack_keys(vmap.keys, new_origin)
    keep = jnp.logical_and(survive, in_range)
    repacked = jnp.where(keep, repacked, INT32_MAX)

    order = jnp.argsort(repacked, stable=True)
    return (
        vmap._replace(
            origin=new_origin,
            packed=repacked[order],
            keys=vmap.keys[order],
            count=vmap.count[order],
            mean=vmap.mean[order],
            cov=vmap.cov[order],
        ),
        removed,
    )
