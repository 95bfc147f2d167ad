"""Pallas TPU kernel: segmented suffix-sums over key-sorted rows.

The per-voxel moment reduction (`CloudPreprocessor.cpp:103-124` role) and
the per-voxel raw-sum aggregation of `map/voxel_map.insert`
(`LocalMap.cpp:47-58` role) both reduce a key-SORTED [N, W] array per key
segment.  `jax.ops.segment_sum` lowers to a random scatter-add — measured
2.34 ms at [131072, 10] on one v5e chip (tools/profile_preprocess.py),
latency-bound per row like every random-access op on this hardware.

But the rows are SORTED: segments are contiguous runs, so the reduction is
a segmented scan — a purely STREAMING computation.  This kernel runs it as
one sequential pass over [B, 10] blocks held in VMEM: log2(B) in-register
doubling passes per block (val[i] += val[i-k] iff key[i] == key[i-k],
exact because equal keys are contiguous in sorted order) plus a [1, W]
carry riding in VMEM scratch across the sequential TPU grid.  HBM traffic
is one read + one write of the array — ~60 µs at these shapes, ~40x under
the scatter-add.

Suffix (not prefix) sums so that each segment's HEAD row ends up holding
the segment total — heads are what every caller keeps.  Rows other than
segment heads hold suffix partial sums (kernel) or segment totals
(fallback); callers must only read head rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048


def _kernel(key_ref, val_ref, out_ref, carry_val, carry_key):
    """One grid step: inclusive segmented scan of a [B, W] block with a
    cross-block carry.  The TPU grid is sequential, so the VMEM/SMEM
    scratch carries the last segment's running sum into the next block."""
    b = val_ref.shape[0]
    key = key_ref[:]  # [B, 1] int32
    val = val_ref[:]  # [B, W] f32

    # in-block doubling passes: exact for sorted keys (equal keys are
    # contiguous, so key[i] == key[i-k] implies one unbroken segment)
    k = 1
    while k < b:
        # top k rows' shifted key is junk — masked off by rowidx >= k
        key_shift = jnp.concatenate([key[:k], key[:-k]], axis=0)
        val_shift = jnp.concatenate(
            [jnp.zeros((k, val.shape[1]), val.dtype), val[:-k]], axis=0
        )
        rowidx = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        same = jnp.logical_and(rowidx >= k, key == key_shift)
        val = val + jnp.where(same, val_shift, 0.0)
        k *= 2

    # cross-block carry: rows continuing the previous block's last segment
    @pl.when(pl.program_id(0) > 0)
    def _():
        cont = key == carry_key[0, 0]
        out_ref[:] = val + jnp.where(cont, carry_val[:], 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = val

    carry_val[:] = out_ref[b - 1, :][None, :]
    carry_key[0, 0] = key[b - 1, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def _segscan_fwd(key, val, *, interpret: bool, block: int):
    n, w = val.shape
    grid = n // block
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), val.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, w), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, w), val.dtype),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(key, val)


def segsum_sorted(
    skey_sorted: jnp.ndarray,
    vals: jnp.ndarray,
    *,
    interpret: bool | None = None,
    block: int = _BLOCK,
) -> jnp.ndarray:
    """Per-segment totals of `vals` [N, W] grouped by the SORTED key array
    `skey_sorted` [N], delivered on each segment's HEAD row (first row of
    its run).  Other rows are unspecified.

    On TPU this is the streaming Pallas suffix-scan above; elsewhere (and
    under `interpret=True` in tests) the same kernel runs interpreted, or
    callers can use `segsum_sorted_ref` for a pure-XLA reference."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, w = vals.shape
    if n % block != 0 or n < block:
        # capacities are powers of two >= 2^12 in every shipped config;
        # fall back rather than constrain tests
        return segsum_sorted_ref(skey_sorted, vals)
    # suffix scan = forward scan of the reversed arrays (reversal keeps
    # segments contiguous; comparisons only test equality)
    key_r = skey_sorted[::-1][:, None]
    val_r = vals[::-1]
    out_r = _segscan_fwd(key_r, val_r, interpret=interpret, block=block)
    return out_r[::-1]


def segsum_sorted_ref(
    skey_sorted: jnp.ndarray, vals: jnp.ndarray
) -> jnp.ndarray:
    """Pure-XLA reference: segment totals broadcast to every row of the
    segment (a superset of the head-row contract)."""
    n = vals.shape[0]
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), skey_sorted[1:] == skey_sorted[:-1]]
    )
    seg_id = jnp.cumsum((~same).astype(jnp.int32)) - 1
    totals = jax.ops.segment_sum(vals, seg_id, num_segments=n)
    return totals[seg_id]
