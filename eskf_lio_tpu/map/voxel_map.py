"""Device-resident voxel map: a two-tier hash-ordered LSM dictionary.

TPU-native re-design of the reference `LocalMap`
(`/root/reference/src/LocalMap.cpp`, `include/ESKF_LIO/LocalMap.hpp`).
Per-voxel state matches the reference's `Voxel` (`LocalMap.hpp:63-89`): a
running mean of member points and a running mean of member point
*covariances* (VGICP's per-voxel distribution is the averaged per-point
covariance, not the member scatter — `LocalMap.hpp:84`), capped at
`max_points_per_voxel` points (`LocalMap.hpp:81`).

Layout — driven by measured TPU primitive costs (tools/bench_compile.py;
one v5e chip behind the axon tunnel):

* runtime law: sorts and dense scans stream at full bandwidth (~1.4 ms for
  32k-590k rows); random gathers/scatters are latency-bound per element
  (~0.3 ms per 32k rows).  compile law: `lax.sort` costs ~10 s of XLA
  compile PER OPERAND (nearly independent of N), 2-D-index scatters cost
  10-34 s, prefix scans scale with N (~25 s at 590k); row gathers/scatters
  and ALU are ~free.  Every algorithm below therefore uses 2-operand
  (key, iota) sorts with payload riding on gathers, flat row scatters, and
  keeps prefix scans off the main-capacity shapes where possible.
* entries are ordered by `skey = order-preserving bijective 32-bit hash of
  the packed voxel key` (`ops.sortmerge.skey_of`).  Bijective => equal skey
  <=> equal voxel (so no `packed` column is stored at all — it is derived
  by the inverse mixer `ops.sortmerge.packed_of_skey` when needed);
  hashing => skeys are uniformly distributed, so a set-associative `view`
  (8 payload-inlined slots per 512-byte bucket row, 4x slot headroom)
  resolves a batch of lookups with ONE [N,128] row-gather + lane compares
  per tier — the per-voxel stats ride in the same gather.
* per-voxel payload is ONE [C, 10] f32 array (count, mean/Σp x3, cov/Σcov
  x6): row gathers/scatters move whole slots per element of latency.
* MAIN tier: capacity C, finalised running stats, ascending by skey,
  rebuilt only on fold/eviction.  DELTA tier: capacity D of *raw sums* in
  APPEND order — the LSM memtable, indexed exactly by its own `d_view`.
  insert = segment-reduce the batch, scatter-add into existing delta rows
  through the view probe (the probe already fetched the old inline sums,
  so the view payload stays fresh with one extra row scatter), append new
  voxels to the tail; when an append would overflow, the whole batch +
  delta folds into MAIN with one merge (O(C), amortised) instead.
* evict — fold + mask + one re-sort by the re-centred keys (ref
  `LocalMap.cpp:60-72`); re-centring keeps the 1024-voxel packing span
  over the eviction radius.

Semantics vs the sequential reference: identical below the point cap; a
batch crossing the cap contributes proportionally rather than by
scan-order truncation (cap applied per merge step, so a saturated voxel
stops accumulating exactly like `LocalMap.hpp:81`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.ops import sortmerge as sm
from eskf_lio_tpu.ops import voxel as vx

INT32_MAX = sm.INT32_MAX

# Lookup view: a set-associative mirror of the dictionary.  Each bucket
# holds VIEW_ASSOC slots of VIEW_SLOT int32 words — [skey, row,
# payload(10, f32 bitcast), 4 pad] — in one 512-byte row, so a whole batch
# lookup is ONE [N, 128] row-gather + lane compares + a lane select: the
# payload rides in the same gather (random gathers are latency-bound per
# element, not bytes-bound, so the wide row is free).  4x slot headroom
# keeps per-bucket overflow negligible even at full table load (Poisson(2)
# tail beyond 8: ~1e-4 per bucket); an entry overflowing its bucket is
# dropped and counted (never misplaced).  HBM cost: the views are 4x
# capacity x 64 B = 128 MiB at the shipped 2^19 main capacity — the
# dominant map allocation, budgeted in BASELINE.md.
VIEW_ASSOC = 8
VIEW_HEADROOM = 4  # total view slots = VIEW_HEADROOM * capacity
VIEW_SLOT = 16  # int32 words per slot (64-byte aligned)
_SLOT_PAY = 12  # words carrying data per slot: skey, row, payload x10


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


class VoxelMap(NamedTuple):
    """Two-tier hash-ordered LSM voxel dictionary."""

    origin: jnp.ndarray  # [3] int32 packing origin (voxel coords)
    # main tier (finalised stats), ascending by skey, INT32_MAX tail
    skey: jnp.ndarray  # [C] int32
    payload: jnp.ndarray  # [C, 10] f32: count, mean(3), cov(6)
    view: jnp.ndarray  # [C/2, 128] int32 set-assoc payload-inlined view
    # delta tier (raw sums), APPEND order, live rows = [0, d_fill)
    d_skey: jnp.ndarray  # [D] int32
    d_payload: jnp.ndarray  # [D, 10] f32: count, Σp(3), Σcov(6)
    d_view: jnp.ndarray  # [D/2, 128] int32
    d_fill: jnp.ndarray  # [] int32 live delta rows

    @property
    def capacity(self) -> int:
        return self.skey.shape[0]

    @property
    def delta_capacity(self) -> int:
        return self.d_skey.shape[0]

    # --- views (io/export, tests) -----------------------------------------
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
    def packed(self) -> jnp.ndarray:
        """[C] packed voxel keys, derived from skey by the inverse mixer."""
        return sm.packed_of_skey(self.skey)

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
            payload=jnp.zeros((capacity, 10), dtype),
            view=_empty_view(capacity),
            d_skey=jnp.full((d,), INT32_MAX, jnp.int32),
            d_payload=jnp.zeros((d, 10), dtype),
            d_view=_empty_view(d),
            d_fill=jnp.zeros((), jnp.int32),
        )

    def live(self) -> jnp.ndarray:
        """Main-tier liveness mask (delta excluded)."""
        return self.skey != INT32_MAX

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
    """All-empty view, built by broadcast (no strided scatter: even the
    one-off eager compile of a strided `.at[]` costs tens of seconds over
    the tunnel backend)."""
    nb = _n_view_buckets(capacity)
    slot = jnp.concatenate(
        [
            jnp.full((1,), INT32_MAX, jnp.int32),
            jnp.zeros((VIEW_SLOT - 1,), jnp.int32),
        ]
    )
    return jnp.tile(slot, (nb, VIEW_ASSOC))


def _slot_values(skey, row, payload):
    """[E, 16] int32 slot image: skey, row, payload (f32 bitcast), pad."""
    e = skey.shape[0]
    return jnp.concatenate(
        [
            skey[:, None],
            row[:, None],
            jax.lax.bitcast_convert_type(payload, jnp.int32),
            jnp.zeros((e, VIEW_SLOT - _SLOT_PAY), jnp.int32),
        ],
        axis=1,
    )


def _scatter_slots(view, b, slot, vals, ok):
    """Write [E, 16] slot images at (bucket b, slot) as ONE flat row
    scatter (2-D-index scatters cost 10-34 s of compile and ~10x the
    runtime on this backend).  Rows with ok=False are dropped."""
    nb = view.shape[0]
    flat = jnp.where(ok, b * VIEW_ASSOC + slot, nb * VIEW_ASSOC)
    out = view.reshape(nb * VIEW_ASSOC, VIEW_SLOT).at[flat].set(
        vals, mode="drop"
    )
    return out.reshape(nb, VIEW_ASSOC * VIEW_SLOT)


def _build_view(
    skey_sorted: jnp.ndarray, payload_sorted: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the payload-inlined set-associative view from an ascending
    skey array and its row payloads.

    bucket(x) = top bits of x's uint32 order, so equal-bucket rows are
    contiguous in the sorted array; rank-in-bucket falls out of a segmented
    iota (one cummax), and one flat row scatter places each slot image.
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
    view = _scatter_slots(
        _empty_view(c), bo, rank, _slot_values(skey_sorted, pos, payload_sorted), ok
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


def _combine_raw(old, add, cap):
    """Capped merge of two [*, 10] RAW-SUM rows (count, Σp, Σcov): scale the
    incoming sums so the count never exceeds `cap` — the batch form of the
    reference's `numPoints < maxNumPoints` insertion gate
    (`LocalMap.hpp:81`): a saturated voxel stops accumulating."""
    c_old, c_add = old[..., 0], add[..., 0]
    cap_add = jnp.clip(cap - c_old, 0.0, c_add)
    scale = jnp.where(c_add > 0, cap_add / jnp.maximum(c_add, 1.0), 0.0)
    return old + scale[..., None] * add


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
      written over that slot's inline payload;
    * a delta-only entry is scattered into its bucket's free slots
      (occupied slots are always a prefix, so slot = first_free +
      rank-in-bucket);
    * a delta-only entry landing in a full bucket is dropped from the view
      (a missed correspondence, never corruption) and counted.

    Returns (LookupView, n_dropped)."""
    cap = jnp.asarray(max_points_per_voxel, vmap.payload.dtype)
    d_cap = vmap.delta_capacity
    # the delta is append-ordered; bucket-rank bookkeeping below needs
    # ascending skey, so sort it first (2-operand sort + one row gather)
    d_skey, _, d_payload = sm.sort_perm(vmap.d_skey, vmap.d_payload)
    d_live = d_skey != INT32_MAX
    nb = vmap.view.shape[0]
    b = sm.bucket_of(d_skey, nb)

    # one bucket gather gives match, lane, inline main payload AND occupancy
    rows = vmap.view[b]  # [D, 128]
    slots = rows.reshape(d_cap, VIEW_ASSOC, VIEW_SLOT)
    eq = slots[:, :, 0] == d_skey[:, None]
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
        d_payload[:, 0], d_payload[:, 1:4], d_payload[:, 4:10],
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
    row_idx = jnp.where(merged, hitslot[:, 1], vmap.capacity + pos)
    view = _scatter_slots(
        vmap.view, b, slot, _slot_values(d_skey, row_idx, d_final), ok
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
# fold (LSM flush: delta [+ batch] -> main)
# ---------------------------------------------------------------------------


def _fold_into_main(vmap: VoxelMap, ex_skey, ex_payload, cap):
    """Merge the main tier with extra raw-sum rows [L] (any order, unique
    keys, typically delta rows + a batch's new voxels).

    One combined 2-operand sort + payload gather; equal-key pairs are
    adjacent (main keys unique, extra keys unique => runs of length <= 2)
    and combine under the point cap; a second same-shape sort compacts the
    surviving rows back to an ascending [C] prefix.

    Returns (skey [C], payload [C,10], view, overflow)."""
    c_cap = vmap.capacity

    p, perm, pay = sm.sort_perm(
        jnp.concatenate([vmap.skey, ex_skey]),
        jnp.concatenate([vmap.payload, ex_payload]),
    )
    old = perm < c_cap

    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool), p[1:] == p[:-1]]
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
    row_payload = jnp.where(
        is_new[:, None],
        jnp.concatenate([out_cnt[:, None], out_mean, out_cov], axis=1),
        pay,
    )

    f_skey, _, f_payload = sm.sort_perm(row_skey, row_payload)
    f_skey, f_payload = f_skey[:c_cap], f_payload[:c_cap]
    kept = f_skey != INT32_MAX
    n_live = jnp.sum((row_skey != INT32_MAX).astype(jnp.int32))
    overflow = jnp.maximum(n_live - jnp.sum(kept.astype(jnp.int32)), 0)
    f_view, _ = _build_view(f_skey, f_payload)
    return f_skey, f_payload, f_view, overflow


def _empty_delta(vmap: VoxelMap):
    d_cap = vmap.delta_capacity
    return (
        jnp.full((d_cap,), INT32_MAX, jnp.int32),
        jnp.zeros((d_cap, 10), vmap.payload.dtype),
        _empty_view(d_cap),
        jnp.zeros((), jnp.int32),
    )


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
) -> tuple[VoxelMap, jnp.ndarray]:
    """Insert a batch of world-frame points + packed covariances.

    Replaces the sequential per-point insert loop (`LocalMap.cpp:47-58`):

    1. ONE (skey, iota) sort groups the batch; per-voxel raw sums come
       from a segment reduction, compacted to unique ascending entries.
    2. ONE `d_view` bucket gather resolves each unique voxel against the
       delta tier: hits scatter-add into their delta rows (the probe
       already fetched the old inline sums, so the view payload is
       refreshed by the same row scatter); misses append to the delta
       tail and claim free view slots.
    3. If the appends would overflow the delta, the delta AND the batch's
       new voxels fold into MAIN together (O(C), amortised) and the delta
       resets — so a batch with more new voxels than the delta capacity
       never drops data (ref grows unboundedly, `LocalMap.cpp:47-58`).

    Returns (new_map, num_dropped): dropped = out-of-span points +
    main-capacity overflow + view-bucket overflow (~1e-4)."""
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

    raw = jnp.concatenate(
        [
            ok.astype(dtype)[:, None],
            points * ok.astype(dtype)[:, None],
            covs_packed * ok.astype(dtype)[:, None],
        ],
        axis=1,
    )  # [N, 10] per-point raw contribution

    # 1. group by voxel: one 2-operand sort, payload rides on the gather
    skey_s, _, raw_s = sm.sort_perm(skey, raw)
    ok_s = skey_s != INT32_MAX
    head, seg_id = sm.unique_segments(skey_s, ok_s)
    u_pay = jax.ops.segment_sum(raw_s, seg_id, num_segments=n)  # [N, 10]
    # unique voxels, ascending skey, compacted to the front: head rows land
    # at their segment id (monotone in the sorted order) — no second sort
    hpos = jnp.where(head, seg_id, n)
    u_skey = jnp.full((n,), INT32_MAX, jnp.int32).at[hpos].set(
        skey_s, mode="drop"
    )
    u_live = u_skey != INT32_MAX

    # 2. one bucket gather resolves every unique voxel against the delta
    nb_d = vmap.d_view.shape[0]
    b = sm.bucket_of(u_skey, nb_d)
    rows = vmap.d_view[b]
    slots = rows.reshape(n, VIEW_ASSOC, VIEW_SLOT)
    eq = slots[:, :, 0] == u_skey[:, None]
    found = jnp.logical_and(jnp.any(eq, axis=1), u_live)
    lane = jnp.argmax(eq, axis=1).astype(jnp.int32)
    hitslot = jnp.take_along_axis(slots, lane[:, None, None], axis=1)[:, 0, :]
    d_row = hitslot[:, 1]
    old_sum = jax.lax.bitcast_convert_type(hitslot[:, 2:_SLOT_PAY], jnp.float32)
    first_free = jnp.sum(
        (slots[:, :, 0] != INT32_MAX).astype(jnp.int32), axis=1
    )

    # capped raw-sum merge for hits (a saturated voxel stops accumulating)
    new_sum = jnp.where(
        found[:, None], _combine_raw(old_sum, u_pay, cap), u_pay
    )
    d_payload = vmap.d_payload.at[
        jnp.where(found, d_row, d_cap)
    ].set(jnp.where(found[:, None], new_sum, 0.0), mode="drop")

    miss = jnp.logical_and(u_live, ~found)
    n_miss = jnp.sum(miss.astype(jnp.int32))
    would_overflow = vmap.d_fill + n_miss > d_cap

    def fold_branch(_):
        ex_skey = jnp.where(miss, u_skey, INT32_MAX)
        ex_pay = jnp.where(miss[:, None], u_pay, 0.0)
        m_skey, m_payload, m_view, overflow = _fold_into_main(
            vmap,
            jnp.concatenate([vmap.d_skey, ex_skey]),
            jnp.concatenate([d_payload, ex_pay]),
            cap,
        )
        return (m_skey, m_payload, m_view) + _empty_delta(vmap) + (overflow,)

    def append_branch(_):
        # segmented rank of misses within their (contiguous) bucket runs
        pos = jnp.arange(n, dtype=jnp.int32)
        bhead = jnp.concatenate([jnp.ones((1,), bool), b[1:] != b[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(bhead, pos, 0)
        )
        miss_i = miss.astype(jnp.int32)
        incl = jnp.cumsum(miss_i)
        base = (incl - miss_i)[seg_start]
        rank = incl - 1 - base  # rank among misses of the same bucket
        slot = first_free + rank
        acc = jnp.logical_and(miss, slot < VIEW_ASSOC)
        acc_i = acc.astype(jnp.int32)
        row = vmap.d_fill + jnp.cumsum(acc_i) - 1  # < d_cap by branch guard
        view_drop = jnp.sum(jnp.logical_and(miss, ~acc).astype(jnp.int32))

        d_skey = vmap.d_skey.at[jnp.where(acc, row, d_cap)].set(
            u_skey, mode="drop"
        )
        d_pay2 = d_payload.at[jnp.where(acc, row, d_cap)].set(
            u_pay, mode="drop"
        )
        # ONE slot scatter refreshes hit payloads and claims miss slots
        upd = jnp.logical_or(found, acc)
        d_view = _scatter_slots(
            vmap.d_view,
            b,
            jnp.where(found, lane, slot),
            _slot_values(u_skey, jnp.where(found, d_row, row), new_sum),
            upd,
        )
        return (
            vmap.skey, vmap.payload, vmap.view,
            d_skey, d_pay2, d_view,
            vmap.d_fill + jnp.sum(acc_i),
            view_drop,
        )

    (
        m_skey, m_payload, m_view,
        o_dskey, o_dpay, o_dview, o_dfill, overflow,
    ) = jax.lax.cond(would_overflow, fold_branch, append_branch, None)

    new_map = VoxelMap(
        origin=vmap.origin,
        skey=m_skey, payload=m_payload, view=m_view,
        d_skey=o_dskey, d_payload=o_dpay, d_view=o_dview, d_fill=o_dfill,
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
    m_skey, m_payload, m_view, overflow = _fold_into_main(
        vmap, vmap.d_skey, vmap.d_payload, cap
    )
    d_skey, d_payload, d_view, d_fill = _empty_delta(vmap)
    return (
        VoxelMap(
            origin=vmap.origin,
            skey=m_skey, payload=m_payload, view=m_view,
            d_skey=d_skey, d_payload=d_payload, d_view=d_view, d_fill=d_fill,
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
    keys = sm.unpack_keys(sm.packed_of_skey(vmap.skey), vmap.origin)
    centers = (keys.astype(vmap.payload.dtype) + 0.5) * voxel_size
    dist = jnp.linalg.norm(centers - center, axis=-1)
    survive = jnp.logical_and(live, dist <= distance_threshold)
    removed = jnp.sum(live.astype(jnp.int32)) - jnp.sum(
        survive.astype(jnp.int32)
    )

    new_origin = vx.voxel_key(center, voxel_size) - 512
    repacked, in_range = sm.pack_keys(keys, new_origin)
    keep = jnp.logical_and(survive, in_range)
    reskey = sm.skey_of(jnp.where(keep, repacked, INT32_MAX))

    f_skey, _, f_payload = sm.sort_perm(reskey, vmap.payload)
    f_view, _ = _build_view(f_skey, f_payload)
    return (
        vmap._replace(
            origin=new_origin,
            skey=f_skey,
            payload=f_payload,
            view=f_view,
        ),
        removed,
    )
