"""Shared open-addressing slot resolution.

Used by both the persistent voxel map (`map/voxel_map.py`) and the
preprocessor's transient per-scan voxel table (`ops/preprocess.py`).  The
reference uses `std::unordered_map` in both places (`LocalMap.cpp:47-58`,
`CloudPreprocessor.cpp:85-99`); here the same role is played by a flat table
with linear probing, filled by contended scatter-min claim rounds — a
deterministic, data-parallel insert with no sequential hash-map walk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eskf_lio_tpu.ops import voxel as vx

_INT_MAX = jnp.int32(2147483647)


def find_or_alloc(
    table_keys: jnp.ndarray,
    occupied: jnp.ndarray,
    query_keys: jnp.ndarray,
    query_valid: jnp.ndarray,
    max_probe: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resolve a slot for each query key, allocating empty slots on miss.

    Args:
      table_keys: [C, 3] int32; occupied: [C] bool.
      query_keys: [Q, 3] int32; query_valid: [Q] bool.
      max_probe: linear-probe bound.  Keys that cannot be placed within
        `max_probe` slots of their base are left unresolved (slot -1) so the
        table never contains entries a `max_probe`-bounded lookup would miss.

    Returns (table_keys, occupied, slot [Q] int32, -1 = unresolved).

    Deterministic: contention for an empty slot is broken by scatter-min on
    the query index.  Duplicate query keys (callers usually dedupe, but hash-
    collision grouping can leave duplicates) converge onto one slot — the
    claim-race loser re-checks and finds the winner's identical key.
    """
    capacity = table_keys.shape[0]
    mask = jnp.int32(capacity - 1)
    q = query_keys.shape[0]
    base = vx.slot_hash(query_keys) & mask
    probe_range = jnp.arange(max_probe, dtype=jnp.int32)
    qidx = jnp.arange(q, dtype=jnp.int32)

    slot_out = jnp.full((q,), -1, jnp.int32)
    unresolved = query_valid

    # Each round gathers the whole probe window at once ([Q, P] in one
    # coalesced read), finds match-or-first-empty with an argmax reduction,
    # and resolves claim contention by scatter-min.  The number of ROUNDS is
    # bounded by claim-contention multiplicity (how many distinct keys fight
    # for the same empty slot), not by probe distance — each round every
    # contended slot admits one winner, so a handful of rounds suffices
    # where the sequential formulation needed max_probe of them.
    def round_body(_, carry):
        table_keys, occupied, slot_out, unresolved = carry
        window = (base[:, None] + probe_range) & mask  # [Q, P]
        occ_w = occupied[window]
        keys_w = table_keys[window]
        match_w = jnp.logical_and(
            occ_w, vx.keys_equal(keys_w, query_keys[:, None, :])
        )
        # chains are contiguous (no deletions): a real match precedes any
        # empty slot, so first-empty vs match ordering needs no tie-break
        has_match = jnp.any(match_w, axis=1)
        match_pos = jnp.argmax(match_w, axis=1).astype(jnp.int32)
        has_empty = jnp.any(~occ_w, axis=1)
        empty_pos = jnp.argmax(~occ_w, axis=1).astype(jnp.int32)

        found = jnp.logical_and(unresolved, has_match)
        slot_out = jnp.where(found, (base + match_pos) & mask, slot_out)
        unresolved = jnp.logical_and(unresolved, ~has_match)

        # claim the first empty slot in the window
        want = jnp.logical_and(unresolved, has_empty)
        target = (base + empty_pos) & mask
        ticket = jnp.full((capacity,), _INT_MAX, jnp.int32)
        ticket = ticket.at[jnp.where(want, target, capacity)].min(
            qidx, mode="drop"
        )
        won = jnp.logical_and(want, ticket[target] == qidx)
        claim_idx = jnp.where(won, target, capacity)  # OOB writes dropped
        table_keys = table_keys.at[claim_idx].set(query_keys, mode="drop")
        occupied = occupied.at[claim_idx].set(True, mode="drop")
        slot_out = jnp.where(won, target, slot_out)
        unresolved = jnp.logical_and(unresolved, ~won)
        # queries with neither match nor empty in-window stay unresolved and
        # give up (probe bound exceeded -> caller drops them)
        unresolved = jnp.logical_and(unresolved, has_empty)
        return table_keys, occupied, slot_out, unresolved

    n_rounds = min(max_probe, 12)
    table_keys, occupied, slot_out, unresolved = jax.lax.fori_loop(
        0, n_rounds, round_body, (table_keys, occupied, slot_out, unresolved)
    )
    return table_keys, occupied, slot_out


def probe_lookup(
    table_keys: jnp.ndarray,
    occupied: jnp.ndarray,
    query_keys: jnp.ndarray,
    max_probe: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find existing entries only.  Returns (slot [Q] int32, hit [Q] bool);
    missed queries get slot 0 with hit False.

    TPU shape: instead of a sequential probe loop (max_probe dependent
    gathers), the whole probe *window* is gathered at once — [Q, P] slots in
    one gather — and the first-match / first-empty logic becomes an argmax
    reduction.  One big coalesced HBM read instead of P round trips."""
    capacity = table_keys.shape[0]
    mask = jnp.int32(capacity - 1)
    base = vx.slot_hash(query_keys) & mask

    window = (base[:, None] + jnp.arange(max_probe, dtype=jnp.int32)) & mask
    occ_w = occupied[window]  # [Q, P]
    keys_w = table_keys[window]  # [Q, P, 3]
    match_w = jnp.logical_and(
        occ_w, vx.keys_equal(keys_w, query_keys[:, None, :])
    )  # [Q, P]

    # chain semantics: a match only counts if no empty slot precedes it
    empty_before = jnp.cumsum((~occ_w).astype(jnp.int32), axis=1) > 0
    valid_match = jnp.logical_and(match_w, ~empty_before)
    hit = jnp.any(valid_match, axis=1)
    first = jnp.argmax(valid_match, axis=1).astype(jnp.int32)
    slot = jnp.where(hit, (base + first) & mask, 0)
    return slot, hit
