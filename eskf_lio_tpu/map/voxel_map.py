"""Device-resident voxel map: a two-tier hash-ordered sorted dictionary (LSM).

TPU-native re-design of the reference `LocalMap`
(`/root/reference/src/LocalMap.cpp`, `include/ESKF_LIO/LocalMap.hpp`).
Per-voxel state matches the reference's `Voxel` (`LocalMap.hpp:63-89`): a
running mean of member points and a running mean of member point
*covariances* (VGICP's per-voxel distribution is the averaged per-point
covariance, not the member scatter — `LocalMap.hpp:84`), capped at
`max_points_per_voxel` points (`LocalMap.hpp:81`).

Layout — driven by measured TPU primitive costs (see git history for the
microbenchmarks; all numbers one v5e chip):

* entries are ordered by `skey = order-preserved bijective 32-bit hash of
  the packed voxel key` (`ops.sortmerge.skey_of`).  Bijective ⇒ equal skey
  ⟺ equal voxel; hashing ⇒ skeys are uniformly distributed, so a
  set-associative `view` (8 payload-inlined slots per 512-byte bucket row,
  4x slot headroom) resolves a batch of lookups with ONE [N,128]
  row-gather + lane compares per tier — the per-voxel stats ride in the
  same gather.  Random gathers are latency-bound per element, not
  bytes-bound (measured: ~300-700 µs per pass at N=32k regardless of row
  width, tools/bench_gn.py `gather`), so one wide gather beats narrow
  key-then-payload gather chains and beats log₂C ≈ 19 binary-search
  rounds by an order of magnitude.
* per-voxel payload is ONE [C, 10] f32 array (count, mean/Σp ×3, cov/Σcov
  ×6): row gathers move ~8× more bytes/s than scalar gathers, and merges
  become single variadic sorts (`lax.sort` with the payload as extra
  operands is ~3× cheaper than argsort + fancy-indexing).
* MAIN tier: capacity C, finalised running stats, rebuilt only on
  compaction/eviction.  DELTA tier: capacity D ≈ C/8 of *raw sums* — the
  LSM memtable.  insert = segment-reduce the batch + one [D+N] merge sort
  (O(N+D) per scan, map-size independent); a `lax.cond` compaction folds
  the delta into MAIN when it overflows (O(C), amortised).
* evict — compact + mask + one re-sort (ref `LocalMap.cpp:60-72`), which
  also re-centres the packing origin so the 1024-voxel span always covers
  the eviction radius.

Semantics vs the sequential reference: identical below the point cap; a
batch crossing the cap contributes proportionally rather than by scan-order
truncation, and delta sums are capped at read/compaction time rather than
per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.ops import sortmerge as sm
from eskf_lio_tpu.ops import voxel as vx

INT32_MAX = sm.INT32_MAX

# Lookup view: a set-associative mirror of the sorted table.  Each bucket
# holds VIEW_ASSOC slots of VIEW_SLOT int32 words — [skey, row,
# payload(10, f32 bitcast), 4 pad] — in one 512-byte row, so a whole batch
# lookup is ONE [N, 128] row-gather + lane compares + a lane select: the
# payload rides in the same gather.  Measured law (tools/bench_gn.py
# `gather` mode, v5e): random gathers cost ~300-700 µs per pass at N=32k
# REGARDLESS of row width (latency-bound per element), so fewest gather
# passes wins and the 512-byte row is free — it is exactly the physical
# size the old 16-int row already occupied after 128-lane HBM padding.
# 4x slot headroom keeps per-bucket overflow negligible even at full table
# load (Poisson(2) tail beyond 8: ~1e-4 per bucket); an overflowing entry
# is dropped from the VIEW only (a missed correspondence, never
# corruption) — the sorted table stays exact.
VIEW_ASSOC = 8
VIEW_HEADROOM = 4  # total view slots = VIEW_HEADROOM * capacity
VIEW_SLOT = 16  # int32 words per slot (64-byte aligned)
_SLOT_PAY = 12  # words actually written per slot: skey, row, payload x10


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


def _n_view_buckets(capacity: int) -> int:
    return max(capacity * VIEW_HEADROOM // VIEW_ASSOC, 1)


def _sort_rows(skey, packed, payload, *extras):
    """Variadic stable sort by (skey, packed); payload [N,10] rides along.
    Returns (skey, packed, payload, *extras) sorted."""
    cols = (
        (skey, packed)
        + tuple(payload[:, j] for j in range(payload.shape[1]))
        + tuple(extras)
    )
    out = jax.lax.sort(cols, num_keys=2, is_stable=True)
    payload_out = jnp.stack(out[2 : 2 + payload.shape[1]], axis=1)
    return (out[0], out[1], payload_out) + tuple(out[2 + payload.shape[1] :])


class VoxelMap(NamedTuple):
    """Two-tier hash-ordered sorted voxel dictionary."""

    origin: jnp.ndarray  # [3] int32 packing origin (voxel coords)
    # main tier (finalised stats), ascending by skey
    skey: jnp.ndarray  # [C] int32, INT32_MAX = empty tail
    packed: jnp.ndarray  # [C] int32 spatial packed key (INT32_MAX empty)
    payload: jnp.ndarray  # [C, 10] f32: count, mean(3), cov(6)
    view: jnp.ndarray  # [C/2, 128] int32 set-assoc payload-inlined view
    # delta tier (raw sums), ascending by skey
    d_skey: jnp.ndarray  # [D] int32
    d_packed: jnp.ndarray  # [D] int32
    d_payload: jnp.ndarray  # [D, 10] f32: count, Σp(3), Σcov(6)
    d_view: jnp.ndarray  # [D/2, 128] int32

    @property
    def capacity(self) -> int:
        return self.skey.shape[0]

    @property
    def delta_capacity(self) -> int:
        return self.d_skey.shape[0]

    # --- back-compat views (io/export, tests) -----------------------------
    @property
    def count(self) -> jnp.ndarray:
        return self.payload[:, 0]

    @property
    def mean(self) -> jnp.ndarray:
        return self.payload[:, 1:4]

    @property
    def cov(self) -> jnp.ndarray:
        return self.payload[:, 4:10]

    @property
    def keys(self) -> jnp.ndarray:
        """[C, 3] voxel integer coords (valid where live())."""
        return sm.unpack_keys(self.packed, self.origin)

    @staticmethod
    def create(
        capacity: int, delta_capacity: int | None = None, dtype=jnp.float32
    ) -> "VoxelMap":
        d = delta_capacity if delta_capacity is not None else max(
            capacity // 8, 1024
        )
        return VoxelMap(
            origin=jnp.full((3,), -512, jnp.int32),
            skey=jnp.full((capacity,), INT32_MAX, jnp.int32),
            packed=jnp.full((capacity,), INT32_MAX, jnp.int32),
            payload=jnp.zeros((capacity, 10), dtype),
            view=_empty_view(capacity),
            d_skey=jnp.full((d,), INT32_MAX, jnp.int32),
            d_packed=jnp.full((d,), INT32_MAX, jnp.int32),
            d_payload=jnp.zeros((d, 10), dtype),
            d_view=_empty_view(d),
        )

    def live(self) -> jnp.ndarray:
        """Main-tier liveness mask (delta excluded)."""
        return self.packed != INT32_MAX

    def num_voxels(self) -> jnp.ndarray:
        """Distinct voxels across both tiers."""
        n_main = jnp.sum(self.live().astype(jnp.int32))
        d_live = self.d_skey != INT32_MAX
        idx = jnp.searchsorted(self.skey, self.d_skey).astype(jnp.int32)
        idx = jnp.minimum(idx, self.capacity - 1)
        in_main = self.skey[idx] == self.d_skey
        n_delta_only = jnp.sum(
            jnp.logical_and(d_live, ~in_main).astype(jnp.int32)
        )
        return n_main + n_delta_only


def _empty_view(capacity: int) -> jnp.ndarray:
    nb = _n_view_buckets(capacity)
    v = jnp.zeros((nb, VIEW_SLOT * VIEW_ASSOC), jnp.int32)
    return v.at[:, 0::VIEW_SLOT].set(INT32_MAX)


def _slot_values(skey, row, payload):
    """[E, 12] int32 slot image: skey, row, payload (f32 bitcast)."""
    return jnp.concatenate(
        [
            skey[:, None],
            row[:, None],
            jax.lax.bitcast_convert_type(payload, jnp.int32),
        ],
        axis=1,
    )


def _scatter_slots(view, b, slot, vals):
    """Write [E, 12] slot images at (bucket b, slot index) in one scatter.
    Out-of-range b/slot drop the entry (mode=drop)."""
    cols = slot[:, None] * VIEW_SLOT + jnp.arange(_SLOT_PAY, dtype=jnp.int32)
    return view.at[b[:, None], cols].set(vals, mode="drop")


def _build_view(
    skey_sorted: jnp.ndarray, payload_sorted: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the payload-inlined set-associative view from an ascending
    skey array and its row payloads.

    bucket(x) = top bits of x's uint32 order, so equal-bucket rows are
    contiguous in the sorted array; rank-in-bucket falls out of a segmented
    iota (one cummax), and one block scatter places each slot image.
    Entries past VIEW_ASSOC per bucket are dropped from the view only —
    returns (view, n_dropped)."""
    c = skey_sorted.shape[0]
    nb = _n_view_buckets(c)
    bo = sm.bucket_of(skey_sorted, nb)
    live = skey_sorted != INT32_MAX
    pos = jnp.arange(c, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), bo[1:] != bo[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, pos, 0)
    )
    rank = pos - seg_start
    ok = jnp.logical_and(live, rank < VIEW_ASSOC)
    dropped = jnp.sum(jnp.logical_and(live, ~ok).astype(jnp.int32))
    b = jnp.where(ok, bo, nb)  # OOB bucket -> dropped
    view = _scatter_slots(
        _empty_view(c), b, rank, _slot_values(skey_sorted, pos, payload_sorted)
    )
    return view, dropped


def _view_probe(
    view: jnp.ndarray, q_skey: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ONE row-gather lookup: returns (payload [N,10] f32, row_idx [N],
    lane [N], found [N]) per query skey — the payload arrives in the same
    gather as the keys (no second gather pass)."""
    nb = view.shape[0]
    b = sm.bucket_of(q_skey, nb)
    rows = view[b]  # [N, 128] — a single 512-byte row gather
    slots = rows.reshape(rows.shape[0], VIEW_ASSOC, VIEW_SLOT)
    eq = slots[:, :, 0] == q_skey[:, None]
    found = jnp.logical_and(jnp.any(eq, axis=1), q_skey != INT32_MAX)
    lane = jnp.argmax(eq, axis=1).astype(jnp.int32)
    hitslot = jnp.take_along_axis(
        slots, lane[:, None, None], axis=1
    )[:, 0, :]  # [N, 16]
    idx = hitslot[:, 1]
    payload = jax.lax.bitcast_convert_type(
        hitslot[:, 2:_SLOT_PAY], jnp.float32
    )
    return payload, idx, lane, found


def _view_find(
    view: jnp.ndarray, q_skey: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compatibility probe: returns (row_idx, found) per query skey."""
    _, idx, _, found = _view_probe(view, q_skey)
    return idx, found


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
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point single-voxel correspondence lookup
    (ref `correspondenceMatching`, `LocalMap.cpp:78-109`: each point reads
    only its own voxel — no neighbourhood search, kept for parity).

    Returns (mean [N,3], cov_packed [N,6], hit [N] bool), combining the
    main entry with any pending delta sums for the same voxel.
    """
    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, vmap.origin)
    return lookup_packed(
        vmap, packed, in_range, max_points_per_voxel=max_points_per_voxel
    )


def lookup_packed(
    vmap: VoxelMap,
    packed: jnp.ndarray,
    in_range: jnp.ndarray,
    *,
    max_points_per_voxel: int = 1000,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """lookup() given precomputed packed keys (see `lookup`).

    TWO gathers total (one per tier): the per-voxel payload is inlined in
    the view buckets, so no dependent payload gather follows the probe."""
    dtype = vmap.payload.dtype
    skey = sm.skey_of(packed)

    pay_m_raw, _, _, m_hit = _view_probe(vmap.view, skey)
    m_hit = jnp.logical_and(m_hit, in_range)
    pay_d_raw, _, _, d_hit = _view_probe(vmap.d_view, skey)
    d_hit = jnp.logical_and(d_hit, in_range)

    pay_m = jnp.where(m_hit[:, None], pay_m_raw, 0.0)
    pay_d = jnp.where(d_hit[:, None], pay_d_raw, 0.0)

    cap = jnp.asarray(max_points_per_voxel, dtype)
    _, mean, cov = _combine(
        pay_m[:, 0], pay_m[:, 1:4], pay_m[:, 4:10],
        pay_d[:, 0], pay_d[:, 1:4], pay_d[:, 4:10], cap,
    )
    return mean, cov, jnp.logical_or(m_hit, d_hit)


# ---------------------------------------------------------------------------
# merged (single-gather) lookup view
# ---------------------------------------------------------------------------


class LookupView(NamedTuple):
    """Read-optimised snapshot of the two-tier map: ONE payload-inlined
    set-associative view holding the cap-combined (main+delta) stats, so a
    batch lookup is a SINGLE bucket row-gather — no payload gather, no
    per-point running-mean combine, no second tier probe.  Built once per
    scan before the GN while-loop; worthwhile when the loop runs enough
    iterations to amortise the build (see `Config.merged_lookup`)."""

    view: jnp.ndarray  # [C/2, 128] int32 — slots carry combined payloads


def build_lookup(
    vmap: VoxelMap, *, max_points_per_voxel: int = 1000
) -> tuple[LookupView, jnp.ndarray]:
    """Fold the delta tier into a single payload-inlined lookup view.

    * a delta entry whose voxel exists in MAIN gets the cap-combined stats
      written over that slot's inline payload (one block scatter);
    * a delta-only entry is scattered into its bucket's free slots
      (occupied slots are always a prefix, so slot = first_free +
      rank-in-bucket);
    * a delta-only entry landing in a full bucket is dropped from the view
      (a missed correspondence, never corruption) and counted.

    Returns (LookupView, n_dropped)."""
    cap = jnp.asarray(max_points_per_voxel, vmap.payload.dtype)
    d_cap = vmap.delta_capacity
    d_live = vmap.d_skey != INT32_MAX
    nb = vmap.view.shape[0]
    b = sm.bucket_of(vmap.d_skey, nb)

    # one bucket gather gives match, lane, inline main payload AND occupancy
    rows = vmap.view[b]  # [D, 128]
    slots = rows.reshape(d_cap, VIEW_ASSOC, VIEW_SLOT)
    eq = slots[:, :, 0] == vmap.d_skey[:, None]
    found = jnp.logical_and(jnp.any(eq, axis=1), d_live)
    lane = jnp.argmax(eq, axis=1).astype(jnp.int32)
    hitslot = jnp.take_along_axis(slots, lane[:, None, None], axis=1)[:, 0, :]
    pay_m_raw = jax.lax.bitcast_convert_type(
        hitslot[:, 2:_SLOT_PAY], jnp.float32
    )
    first_free = jnp.sum(
        (slots[:, :, 0] != INT32_MAX).astype(jnp.int32), axis=1
    )

    merged = found
    pay_m = jnp.where(merged[:, None], pay_m_raw, 0.0)
    cnt, mean, cov = _combine(
        pay_m[:, 0], pay_m[:, 1:4], pay_m[:, 4:10],
        vmap.d_payload[:, 0], vmap.d_payload[:, 1:4], vmap.d_payload[:, 4:10],
        cap,
    )
    d_final = jnp.concatenate([cnt[:, None], mean, cov], axis=1)  # [D, 10]

    pos = jnp.arange(d_cap, dtype=jnp.int32)
    # slot index: overwrite the matched slot for merged entries; first free
    # slot (+ rank among same-bucket new entries) for delta-only ones.
    # d_skey ascends and bucket_of is monotone, so equal-bucket runs are
    # contiguous: segmented rank via one cummax + one cumsum.
    new = jnp.logical_and(d_live, ~found)
    head = jnp.concatenate([jnp.ones((1,), bool), b[1:] != b[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, pos, 0)
    )
    incl = jnp.cumsum(new.astype(jnp.int32))
    base = (incl - new.astype(jnp.int32))[seg_start]
    rank = incl - 1 - base  # rank among NEW entries of the same bucket

    slot = jnp.where(merged, lane, first_free + rank)
    ok = jnp.logical_and(d_live, slot < VIEW_ASSOC)
    dropped = jnp.sum(jnp.logical_and(d_live, ~ok).astype(jnp.int32))
    bs = jnp.where(ok, b, nb)  # OOB bucket -> dropped
    row_idx = jnp.where(merged, hitslot[:, 1], vmap.capacity + pos)
    view = _scatter_slots(
        vmap.view, bs, slot, _slot_values(vmap.d_skey, row_idx, d_final)
    )
    return LookupView(view=view), dropped


def lookup_merged(
    lv: LookupView,
    points: jnp.ndarray,
    *,
    voxel_size: float,
    origin: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-gather correspondence lookup against a `build_lookup`
    snapshot (ref `correspondenceMatching`, `LocalMap.cpp:78-109`): the
    bucket row-gather returns the combined payload directly.

    Returns (mean [N,3], cov_packed [N,6], hit [N] bool)."""
    keys = vx.voxel_key(points, voxel_size)
    packed, in_range = sm.pack_keys(keys, origin)
    skey = sm.skey_of(packed)
    pay_raw, _, _, found = _view_probe(lv.view, skey)
    hit = jnp.logical_and(found, in_range)
    pay = jnp.where(hit[:, None], pay_raw, 0.0)
    return pay[:, 1:4], pay[:, 4:10], hit


# ---------------------------------------------------------------------------
# insert (delta merge + conditional compaction)
# ---------------------------------------------------------------------------


def _merge_delta(vmap: VoxelMap, new_skey, new_packed, new_payload, cap):
    """Merge new raw-sum entries [N] into the delta tier.

    Returns (skey, packed, payload) of length D+N (sorted, duplicates
    combined under the point cap, dead rows = INT32_MAX) plus the live
    count.  Sums are capped here as well as at read so a voxel that
    saturates within one delta epoch stops accumulating, matching the
    reference's `numPoints < maxNumPoints` gate (`LocalMap.hpp:81`) up to
    the proportional batch-crossing rule."""
    p, k, pay = _sort_rows(
        jnp.concatenate([vmap.d_skey, new_skey]),
        jnp.concatenate([vmap.d_packed, new_packed]),
        jnp.concatenate([vmap.d_payload, new_payload]),
    )

    # duplicates are adjacent (each side is deduped): later row absorbs,
    # capped — prior sums take precedence (they arrived first; the stable
    # sort keeps delta rows ahead of equal-keyed new rows)
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool),
         jnp.logical_and(p[1:] == p[:-1], k[1:] == k[:-1])]
    )
    next_same = jnp.concatenate([prev_same[1:], jnp.zeros((1,), bool)])
    pay_prev = jnp.where(
        prev_same[:, None],
        jnp.concatenate([jnp.zeros((1, 10), pay.dtype), pay[:-1]]),
        0.0,
    )
    c = pay[:, 0]
    c_prev = pay_prev[:, 0]
    cap_add = jnp.clip(cap - c_prev, 0.0, c)
    scale = jnp.where(c > 0, cap_add / jnp.maximum(c, 1.0), 0.0)
    pay_out = jnp.concatenate(
        [
            (c_prev + cap_add)[:, None],
            pay_prev[:, 1:] + scale[:, None] * pay[:, 1:],
        ],
        axis=1,
    )
    # first row of a duplicate pair dies
    p_out = jnp.where(next_same, INT32_MAX, p)
    k_out = jnp.where(next_same, INT32_MAX, k)
    live = jnp.sum((p_out != INT32_MAX).astype(jnp.int32))
    # recompact: live ascending, dead/empty at the end
    p_f, k_f, pay_f = _sort_rows(p_out, k_out, pay_out)
    return p_f, k_f, pay_f, live


def _compact_into_main(vmap: VoxelMap, dskey, dpacked, dpayload, cap):
    """LSM flush: fold raw-sum entries [L] into the main tier.
    Returns (skey [C], packed [C], payload [C,10], view, overflow)."""
    c_cap = vmap.capacity
    l = dskey.shape[0]
    is_old = jnp.concatenate(
        [jnp.ones((c_cap,), jnp.int32), jnp.zeros((l,), jnp.int32)]
    )
    p, k, pay, old_i = _sort_rows(
        jnp.concatenate([vmap.skey, dskey]),
        jnp.concatenate([vmap.packed, dpacked]),
        jnp.concatenate([vmap.payload, dpayload]),
        is_old,
    )
    old = old_i.astype(bool)

    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool),
         jnp.logical_and(p[1:] == p[:-1], k[1:] == k[:-1])]
    )
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), old[:-1]])
    pay_prev = jnp.concatenate([jnp.zeros((1, 10), pay.dtype), pay[:-1]])

    is_new = jnp.logical_and(~old, p != INT32_MAX)
    merged = jnp.logical_and(is_new, jnp.logical_and(prev_same, prev_old))

    c_main = jnp.where(merged, pay_prev[:, 0], 0.0)
    mean_m = jnp.where(merged[:, None], pay_prev[:, 1:4], 0.0)
    cov_m = jnp.where(merged[:, None], pay_prev[:, 4:10], 0.0)
    out_cnt, out_mean, out_cov = _combine(
        c_main, mean_m, cov_m, pay[:, 0], pay[:, 1:4], pay[:, 4:10], cap
    )

    next_absorbs = jnp.concatenate([merged[1:], jnp.zeros((1,), bool)])
    dead = jnp.logical_and(old, next_absorbs)
    keep_row = jnp.logical_and(p != INT32_MAX, ~dead)
    row_skey = jnp.where(keep_row, p, INT32_MAX)
    row_packed = jnp.where(keep_row, k, INT32_MAX)
    row_payload = jnp.where(
        is_new[:, None],
        jnp.concatenate([out_cnt[:, None], out_mean, out_cov], axis=1),
        pay,
    )

    f_skey, f_packed, f_payload = _sort_rows(row_skey, row_packed, row_payload)
    f_skey, f_packed, f_payload = (
        f_skey[:c_cap], f_packed[:c_cap], f_payload[:c_cap]
    )
    kept = f_skey != INT32_MAX
    n_live = jnp.sum((row_skey != INT32_MAX).astype(jnp.int32))
    overflow = jnp.maximum(n_live - jnp.sum(kept.astype(jnp.int32)), 0)
    f_view, _ = _build_view(f_skey, f_payload)
    return f_skey, f_packed, f_payload, f_view, overflow


def insert(
    vmap: VoxelMap,
    points: jnp.ndarray,
    covs_packed: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    max_points_per_voxel: int,
) -> tuple[VoxelMap, jnp.ndarray]:
    """Insert a batch of world-frame points + packed covariances.

    Replaces the sequential per-point insert loop (`LocalMap.cpp:47-58`):
    segment-reduce the batch per voxel, merge the raw sums into the DELTA
    tier (O(N+D) — map-size independent), compacting into MAIN only when
    the delta overflows.  Returns (new_map, num_dropped)."""
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
    skey = sm.skey_of(jnp.where(ok, packed, INT32_MAX))
    packed = jnp.where(ok, packed, INT32_MAX)

    raw = jnp.concatenate(
        [
            ok.astype(dtype)[:, None],
            points * ok.astype(dtype)[:, None],
            covs_packed * ok.astype(dtype)[:, None],
        ],
        axis=1,
    )  # [N, 10] per-point raw contribution
    skey_s, packed_s, raw_s = _sort_rows(skey, packed, raw)
    ok_s = skey_s != INT32_MAX

    head, seg_id = sm.unique_segments2(skey_s, packed_s, ok_s)
    seg_pay = jax.ops.segment_sum(raw_s, seg_id, num_segments=n)

    # compact segment heads to the front (ascending skey preserved, since
    # head positions ascend with skey in the sorted batch)
    pos = jnp.arange(n, dtype=jnp.int32)
    hkey = jnp.where(head, pos, INT32_MAX)
    h_sorted, new_skey, new_packed, comp = jax.lax.sort(
        (hkey, skey_s, packed_s, pos), num_keys=1, is_stable=True
    )
    is_head = h_sorted != INT32_MAX
    new_payload = jnp.where(is_head[:, None], seg_pay[seg_id[comp]], 0.0)
    new_packed = jnp.where(is_head, new_packed, INT32_MAX)
    new_skey = jnp.where(is_head, new_skey, INT32_MAX)

    dp, dk, dpay, d_live = _merge_delta(
        vmap, new_skey, new_packed, new_payload, cap
    )

    def no_compact(_):
        d_view, _ = _build_view(dp[:d_cap], dpay[:d_cap])
        return (
            vmap.skey, vmap.packed, vmap.payload, vmap.view,
            dp[:d_cap], dk[:d_cap], dpay[:d_cap], d_view,
            jnp.asarray(0, jnp.int32),
        )

    def compact_now(_):
        m_skey, m_packed, m_payload, m_view, overflow = _compact_into_main(
            vmap, dp, dk, dpay, cap
        )
        return (
            m_skey, m_packed, m_payload, m_view,
            jnp.full((d_cap,), INT32_MAX, jnp.int32),
            jnp.full((d_cap,), INT32_MAX, jnp.int32),
            jnp.zeros((d_cap, 10), dtype),
            _empty_view(d_cap),
            overflow,
        )

    (
        m_skey, m_packed, m_payload, m_view,
        o_dp, o_dk, o_dpay, o_dview, overflow,
    ) = jax.lax.cond(d_live <= d_cap, no_compact, compact_now, None)

    new_map = VoxelMap(
        origin=vmap.origin,
        skey=m_skey, packed=m_packed, payload=m_payload, view=m_view,
        d_skey=o_dp, d_packed=o_dk, d_payload=o_dpay, d_view=o_dview,
    )
    return new_map, dropped_range + overflow


# ---------------------------------------------------------------------------
# compaction / eviction
# ---------------------------------------------------------------------------


def compact(
    vmap: VoxelMap, *, max_points_per_voxel: int
) -> tuple[VoxelMap, jnp.ndarray]:
    """Force the LSM flush (delta -> main).  Used before export/eviction."""
    cap = jnp.asarray(max_points_per_voxel, vmap.payload.dtype)
    m_skey, m_packed, m_payload, m_view, overflow = _compact_into_main(
        vmap, vmap.d_skey, vmap.d_packed, vmap.d_payload, cap
    )
    d_cap = vmap.delta_capacity
    dtype = vmap.payload.dtype
    return (
        VoxelMap(
            origin=vmap.origin,
            skey=m_skey, packed=m_packed, payload=m_payload, view=m_view,
            d_skey=jnp.full((d_cap,), INT32_MAX, jnp.int32),
            d_packed=jnp.full((d_cap,), INT32_MAX, jnp.int32),
            d_payload=jnp.zeros((d_cap, 10), dtype),
            d_view=_empty_view(d_cap),
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
) -> tuple[VoxelMap, jnp.ndarray]:
    """Drop voxels farther than `distance_threshold` from `center`
    (ref `needsPointRemoval`, `LocalMap.cpp:149-154`), after folding the
    delta in; re-centres the packing origin on `center`.

    Returns (new_map, num_removed)."""
    vmap, _ = compact(vmap, max_points_per_voxel=max_points_per_voxel)
    live = vmap.live()
    keys = sm.unpack_keys(vmap.packed, vmap.origin)
    centers = (keys.astype(vmap.payload.dtype) + 0.5) * voxel_size
    dist = jnp.linalg.norm(centers - center, axis=-1)
    survive = jnp.logical_and(live, dist <= distance_threshold)
    removed = jnp.sum(live.astype(jnp.int32)) - jnp.sum(
        survive.astype(jnp.int32)
    )

    new_origin = vx.voxel_key(center, voxel_size) - 512
    repacked, in_range = sm.pack_keys(keys, new_origin)
    keep = jnp.logical_and(survive, in_range)
    repacked = jnp.where(keep, repacked, INT32_MAX)
    reskey = sm.skey_of(repacked)

    f_skey, f_packed, f_payload = _sort_rows(reskey, repacked, vmap.payload)
    f_view, _ = _build_view(f_skey, f_payload)
    return (
        vmap._replace(
            origin=new_origin,
            skey=f_skey,
            packed=f_packed,
            payload=f_payload,
            view=f_view,
        ),
        removed,
    )
