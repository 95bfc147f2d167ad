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

_BLOCK = 16384


def _kernel(key_ref, val_ref, out_ref, carry_val, carry_key):
    """One grid step: inclusive segmented scan along the LANE axis of a
    [W, B] block with a cross-block carry.  The TPU grid is sequential, so
    the VMEM/SMEM scratch carries the last segment's running sum into the
    next block.

    Transposed (struct-of-arrays) layout: the scan axis rides the 128-lane
    dimension, so every VPU op uses full lanes — the [B, W] row layout
    padded W=10 to 128 lanes and cost ~13x the VMEM traffic across the
    log2(B) doubling passes."""
    b = val_ref.shape[1]
    key = key_ref[:]  # [1, B] int32
    val = val_ref[:]  # [W, B] f32

    # in-block doubling passes: exact for sorted keys (equal keys are
    # contiguous, so key[i] == key[i-k] implies one unbroken segment)
    k = 1
    while k < b:
        # first k lanes' shifted key is junk — masked off by lane >= k
        key_shift = jnp.concatenate([key[:, :k], key[:, :-k]], axis=1)
        val_shift = jnp.concatenate(
            [jnp.zeros((val.shape[0], k), val.dtype), val[:, :-k]], axis=1
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        same = jnp.logical_and(lane >= k, key == key_shift)
        val = val + jnp.where(same, val_shift, 0.0)
        k *= 2

    # cross-block carry: lanes continuing the previous block's last segment
    @pl.when(pl.program_id(0) > 0)
    def _():
        cont = key == carry_key[0, 0]
        out_ref[:] = val + jnp.where(cont, carry_val[:], 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = val

    carry_val[:] = out_ref[:, b - 1][:, None]
    carry_key[0, 0] = key[0, b - 1]


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def _segscan_fwd(key, val, *, interpret: bool, block: int):
    """key [1, N] int32, val [W, N] -> inclusive segmented scan along N."""
    w, n = val.shape
    grid = n // block
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((w, n), val.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((w, block), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((w, block), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((w, 1), val.dtype),
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
    # the grid needs block | n: shrink to the largest power-of-two factor
    # of n (capacities are 2^a or 3*2^a in every shipped config)
    block = min(block, n & (-n))
    if n % block != 0 or block < 64:
        # degenerate size — fall back rather than constrain callers
        return segsum_sorted_ref(skey_sorted, vals)
    # suffix scan = forward scan of the reversed arrays (reversal keeps
    # segments contiguous; comparisons only test equality); transposed
    # struct-of-arrays layout so the scan axis rides the lanes
    key_r = skey_sorted[::-1][None, :]
    val_r = vals[::-1].T
    out_r = _segscan_fwd(key_r, val_r, interpret=interpret, block=block)
    return out_r.T[::-1]


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
