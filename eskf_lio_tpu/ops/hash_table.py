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

    slot_out = jnp.full((q,), -1, jnp.int32)
    probe = jnp.zeros((q,), jnp.int32)
    unresolved = query_valid

    def round_body(_, carry):
        table_keys, occupied, slot_out, probe, unresolved = carry
        slot = (base + probe) & mask
        slot_occ = occupied[slot]
        match = jnp.logical_and(
            slot_occ, vx.keys_equal(table_keys[slot], query_keys)
        )

        found = jnp.logical_and(unresolved, match)
        slot_out = jnp.where(found, slot, slot_out)
        unresolved = jnp.logical_and(unresolved, ~match)

        # claim attempt on empty slots; scatter-min picks one winner per slot
        want = jnp.logical_and(unresolved, ~slot_occ)
        ticket = jnp.full((capacity,), _INT_MAX, jnp.int32)
        qidx = jnp.arange(q, dtype=jnp.int32)
        ticket = ticket.at[jnp.where(want, slot, capacity)].min(
            qidx, mode="drop"
        )
        won = jnp.logical_and(want, ticket[slot] == qidx)
        claim_idx = jnp.where(won, slot, capacity)  # OOB writes are dropped
        table_keys = table_keys.at[claim_idx].set(query_keys, mode="drop")
        occupied = occupied.at[claim_idx].set(True, mode="drop")
        slot_out = jnp.where(won, slot, slot_out)
        unresolved = jnp.logical_and(unresolved, ~won)

        # claim-race losers retry the SAME slot (the winner's key may equal
        # theirs); occupied-mismatch advances the probe.
        advance = jnp.logical_and(
            unresolved, jnp.logical_and(slot_occ, ~match)
        )
        probe = probe + advance.astype(jnp.int32)
        unresolved = jnp.logical_and(unresolved, probe < max_probe)
        return table_keys, occupied, slot_out, probe, unresolved

    table_keys, occupied, slot_out, probe, unresolved = jax.lax.fori_loop(
        0,
        2 * max_probe,  # claim-retry rounds do not advance the probe
        round_body,
        (table_keys, occupied, slot_out, probe, unresolved),
    )
    return table_keys, occupied, slot_out


def probe_lookup(
    table_keys: jnp.ndarray,
    occupied: jnp.ndarray,
    query_keys: jnp.ndarray,
    max_probe: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find existing entries only.  Returns (slot [Q] int32, hit [Q] bool);
    missed queries get slot 0 with hit False.  Probing stops at the first
    empty slot (chain end) — consistent with `find_or_alloc`'s bound."""
    capacity = table_keys.shape[0]
    mask = jnp.int32(capacity - 1)
    base = vx.slot_hash(query_keys) & mask
    q = query_keys.shape[0]

    found_slot = jnp.zeros((q,), jnp.int32)
    hit = jnp.zeros((q,), bool)
    live = jnp.ones((q,), bool)

    def body(i, carry):
        found_slot, hit, live = carry
        slot = (base + i) & mask
        occ = occupied[slot]
        match = jnp.logical_and(occ, vx.keys_equal(table_keys[slot], query_keys))
        new_hit = jnp.logical_and(live, match)
        found_slot = jnp.where(new_hit, slot, found_slot)
        hit = jnp.logical_or(hit, new_hit)
        live = jnp.logical_and(live, jnp.logical_and(occ, ~match))
        return found_slot, hit, live

    found_slot, hit, _ = jax.lax.fori_loop(0, max_probe, body, (found_slot, hit, live))
    return found_slot, hit
