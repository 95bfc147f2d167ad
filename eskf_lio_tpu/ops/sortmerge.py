"""Sort-merge primitives for voxel-keyed joins.

Random-access hash probing is latency-bound on TPU (~12 ns per gathered
element); sorts and dense scans run at full throughput with a flat ~ms cost.
So every "look this voxel up" operation in the framework is expressed as a
sort/merge over arrays instead of pointer- or probe-chasing:

* `pack_keys` — 3D voxel coords packed into ONE int32 relative to a local
  origin (10 bits per axis).  Neighbour offsets become constant adds.
* `sort_perm` — the ONE sanctioned sort shape: a stable 2-operand
  (key, iota) `lax.sort` with every payload column riding on a row gather
  of the permutation, because this backend's XLA compile time is ~10 s per
  sort operand (tools/bench_compile.py) while gathers compile for free.

These primitives power the preprocessor's transient per-scan voxel
aggregation and the sorted `VoxelMap` (see `map/voxel_map.py`), replacing
the reference's two `std::unordered_map`s (`CloudPreprocessor.cpp:85-99`,
`LocalMap.cpp:47-58`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = jnp.int32(2147483647)

# 10 bits per axis => grid extent 1024 voxels per axis around the origin
_BITS = 10
_SPAN = 1 << _BITS
_MASK = _SPAN - 1


def pack_keys(keys: jnp.ndarray, origin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 3] int32 voxel coords -> packed int32 relative to `origin` [3].

    Returns (packed, in_range).  Out-of-range coords (beyond the 1024-voxel
    span) are flagged; callers mask them out.  Packing is order-preserving
    per axis, and ±1 neighbour offsets become constant adds of
    (1<<20, 1<<10, 1)."""
    rel = keys - origin
    in_range = jnp.all(
        jnp.logical_and(rel >= 0, rel < _SPAN), axis=-1
    )
    packed = (rel[..., 0] << (2 * _BITS)) | (rel[..., 1] << _BITS) | rel[..., 2]
    return jnp.where(in_range, packed, INT32_MAX), in_range


def unpack_keys(packed: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `pack_keys`: packed int32 -> [..., 3] voxel coords.
    Sentinel (INT32_MAX) rows produce junk; callers mask by liveness."""
    rel = jnp.stack(
        [
            (packed >> (2 * _BITS)) & _MASK,
            (packed >> _BITS) & _MASK,
            packed & _MASK,
        ],
        axis=-1,
    )
    return rel + origin


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Bijective 32-bit mixer (lowbias32 finalizer).  uint32 -> uint32.
    Bijectivity means equal hashes ⟺ equal inputs — hash order is a valid
    total order for exact-match dictionaries, with uniformly distributed
    keys (the property the bucket index relies on)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def unmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of `mix32` (modular inverses of the odd multipliers,
    self-inverse xor-shift chains).  uint32 -> uint32."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x43021123)  # 0x846CA68B^-1 mod 2^32
    x = x ^ (x >> 15) ^ (x >> 30)
    x = x * jnp.uint32(0x1D69E2A5)  # 0x7FEB352D^-1 mod 2^32
    x = x ^ (x >> 16)
    return x


def skey_of(packed: jnp.ndarray) -> jnp.ndarray:
    """Hash sort key of a packed voxel key: int32 whose ascending order is
    the uint32 order of mix32(packed).  INT32_MAX passes through as the
    empty sentinel; a real key hashing to INT32_MAX is remapped to
    INT32_MAX-1 (a 2^-32 chance of one unreachable voxel, documented)."""
    h = mix32(packed) ^ jnp.uint32(0x80000000)
    s = jax.lax.bitcast_convert_type(h, jnp.int32)
    s = jnp.where(s == INT32_MAX, INT32_MAX - 1, s)
    return jnp.where(packed == INT32_MAX, INT32_MAX, s)


def packed_of_skey(skey: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `skey_of`: recover the packed voxel key from its hash sort
    key via `unmix32` — free ALU instead of storing (and sorting/gathering)
    a parallel `packed` column.  Exact except for `skey_of`'s documented
    INT32_MAX-1 remap (the same 2^-32 caveat)."""
    h = jax.lax.bitcast_convert_type(skey, jnp.uint32) ^ jnp.uint32(0x80000000)
    p = jax.lax.bitcast_convert_type(unmix32(h), jnp.int32)
    return jnp.where(skey == INT32_MAX, INT32_MAX, p)


def sort_perm(skey: jnp.ndarray, *rows: jnp.ndarray, take: int | None = None):
    """Stable ascending sort by `skey` as a TWO-operand `lax.sort`
    (key, iota); every extra array rides via one row gather on the
    permutation.

    Compile-cost law on this TPU backend (measured, tools/bench_compile.py):
    `lax.sort` costs ~10 s of XLA compile PER OPERAND nearly independent of
    N, so threading payload columns through the sort is a compile bomb
    (13 operands ~ 2 minutes per instance), while gathers compile in <1 s
    and run at ~0.3 ms per 32k rows.  Sort runtime is ~1.4 ms at 32k-590k
    rows either way.

    `take=k` keeps only the first k sorted rows BEFORE the ride-along
    gathers — when the caller immediately slices (head compaction), this
    shrinks the gather from N rows to k."""
    n = skey.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    skey_s, perm = jax.lax.sort((skey, iota), num_keys=1, is_stable=True)
    if take is not None and take < n:
        skey_s, perm = skey_s[:take], perm[:take]
    return (skey_s, perm) + tuple(r[perm] for r in rows)


def bucket_of(skey: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    """Top log2(n_buckets) bits of the uint32 order of an skey."""
    if n_buckets <= 1:
        return jnp.zeros(skey.shape, jnp.int32)
    bits = n_buckets.bit_length() - 1
    ub = jax.lax.bitcast_convert_type(skey, jnp.uint32) ^ jnp.uint32(
        0x80000000
    )
    return jax.lax.bitcast_convert_type(
        ub >> jnp.uint32(32 - bits), jnp.int32
    )


def neighbor_offsets_packed() -> jnp.ndarray:
    """[27] packed-key offsets of the 3x3x3 neighbourhood."""
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append((dx << (2 * _BITS)) + (dy << _BITS) + dz)
    return jnp.asarray(offs, jnp.int32)


def unique_segments(sorted_keys: jnp.ndarray, valid_sorted: jnp.ndarray):
    """Heads + segment ids over a sorted key array.

    Returns (head [N] bool, seg_id [N] int32) where seg_id is the rank of
    the segment (invalid rows land in the last bin)."""
    n = sorted_keys.shape[0]
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_keys[1:] == sorted_keys[:-1]]
    )
    head = jnp.logical_and(valid_sorted, ~same)
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg_id = jnp.where(valid_sorted, jnp.maximum(seg_id, 0), n - 1)
    return head, seg_id
