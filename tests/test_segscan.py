"""Segmented suffix-scan kernel vs the pure-XLA reference (head rows only
— the contract, `ops/segscan.py`)."""

import numpy as np
import jax.numpy as jnp

from eskf_lio_tpu.ops import segscan


def _heads(keys):
    return np.concatenate([[True], keys[1:] != keys[:-1]])


def _case(rng, n, n_keys, w=10, block=64):
    keys = np.sort(rng.integers(0, n_keys, size=n).astype(np.int32))
    vals = rng.normal(size=(n, w)).astype(np.float32)
    out_k = np.asarray(
        segscan.segsum_sorted(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True, block=block
        )
    )
    out_r = np.asarray(
        segscan.segsum_sorted_ref(jnp.asarray(keys), jnp.asarray(vals))
    )
    h = _heads(keys)
    np.testing.assert_allclose(out_k[h], out_r[h], rtol=1e-5, atol=1e-5)


def test_segments_within_block(rng):
    _case(rng, 256, 64)


def test_segments_crossing_blocks(rng):
    # few distinct keys -> long runs crossing many 64-row blocks
    _case(rng, 512, 5)


def test_single_segment_spanning_everything(rng):
    keys = np.zeros(256, np.int32)
    vals = rng.normal(size=(256, 4)).astype(np.float32)
    out = np.asarray(
        segscan.segsum_sorted(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True, block=64
        )
    )
    np.testing.assert_allclose(out[0], vals.sum(axis=0), rtol=1e-4, atol=1e-4)


def test_all_unique_keys(rng):
    keys = np.arange(256, dtype=np.int32)
    vals = rng.normal(size=(256, 4)).astype(np.float32)
    out = np.asarray(
        segscan.segsum_sorted(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True, block=64
        )
    )
    np.testing.assert_allclose(out, vals, rtol=1e-6)


def test_non_multiple_size_falls_back(rng):
    # n not divisible by block -> reference path, same head contract
    _case(rng, 200, 30, block=64)
