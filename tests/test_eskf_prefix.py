"""Parallel-prefix ESKF propagation vs the sequential scan reference."""

import numpy as np
import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.types import ImuChunk

CFG = Config()
NOISE = eskf.make_noise_params(CFG)


def make_chunk(rng, m, t_end_frac=0.8, invalid_at=None):
    dts = np.full(m, 0.0025, np.float32)
    t_rel = (np.cumsum(dts) - t_end_frac * m * 0.0025).astype(np.float32)
    gyro = 0.3 * rng.normal(size=(m, 3)).astype(np.float32)
    accel = (
        np.tile([0, 0, -9.7], (m, 1)) + rng.normal(size=(m, 3))
    ).astype(np.float32)
    valid = np.ones(m, bool)
    if invalid_at is not None:
        valid[invalid_at] = False
    return ImuChunk(
        dt=jnp.asarray(dts),
        t_rel=jnp.asarray(t_rel),
        gyro=jnp.asarray(gyro),
        accel=jnp.asarray(accel),
        valid=jnp.asarray(valid),
    )


def seq_base(state, chunk):
    """Sequential reference: state at the last valid sample with t_rel<=0.
    (Index found by explicit max — searchsorted would mis-handle invalid
    samples injected mid-chunk.)"""
    final, hist, full = eskf.predict_chunk_full(state, chunk, NOISE)
    valid = np.asarray(hist.valid)
    ts = np.asarray(hist.t_rel)
    idxs = np.where(valid & (ts <= 0))[0]
    base_idx = int(idxs.max())
    return eskf.state_at(full, jnp.asarray(base_idx)), hist


def assert_state_close(a, b, atol_p=1e-4, atol_P=2e-6):
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=atol_p)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), atol=atol_p)
    qd = min(
        np.abs(np.asarray(a.q) - np.asarray(b.q)).max(),
        np.abs(np.asarray(a.q) + np.asarray(b.q)).max(),
    )
    assert qd < 1e-5
    np.testing.assert_allclose(
        np.asarray(a.P), np.asarray(b.P), rtol=1e-3, atol=atol_P
    )


def test_prefix_matches_sequential(rng):
    state = eskf.init_state(CFG)
    chunk = make_chunk(rng, 40)
    base_seq, hist_seq = seq_base(state, chunk)
    base_pre, hist_pre = eskf.predict_chunk_prefix(
        state, chunk, NOISE, base_mask=chunk.t_rel <= 0.0
    )
    assert_state_close(base_pre, base_seq)
    np.testing.assert_allclose(
        np.asarray(hist_pre.p), np.asarray(hist_seq.p), atol=1e-4
    )
    qs = np.abs(np.asarray(hist_pre.q)) - np.abs(np.asarray(hist_seq.q))
    assert np.abs(qs).max() < 1e-5


def test_prefix_full_chunk_is_final_state(rng):
    state = eskf.init_state(CFG)
    chunk = make_chunk(rng, 24)
    final_seq, _ = eskf.predict_chunk(state, chunk, NOISE)
    final_pre, _ = eskf.predict_chunk_prefix(state, chunk, NOISE)
    assert_state_close(final_pre, final_seq)


def test_prefix_with_padding(rng):
    state = eskf.init_state(CFG)
    m, pad = 20, 12
    c = make_chunk(rng, m)
    c_pad = ImuChunk(
        dt=jnp.concatenate([c.dt, jnp.full(pad, 0.0025)]),
        t_rel=jnp.concatenate([c.t_rel, jnp.full(pad, jnp.inf)]),
        gyro=jnp.concatenate([c.gyro, jnp.ones((pad, 3))]),
        accel=jnp.concatenate([c.accel, jnp.ones((pad, 3))]),
        valid=jnp.concatenate([c.valid, jnp.zeros(pad, bool)]),
    )
    b1, _ = eskf.predict_chunk_prefix(state, c, NOISE, base_mask=c.t_rel <= 0)
    b2, _ = eskf.predict_chunk_prefix(
        state, c_pad, NOISE, base_mask=c_pad.t_rel <= 0
    )
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prefix_with_midchunk_invalid(rng):
    state = eskf.init_state(CFG)
    chunk = make_chunk(rng, 16, invalid_at=7)
    base_seq, _ = seq_base(state, chunk)
    base_pre, _ = eskf.predict_chunk_prefix(
        state, chunk, NOISE, base_mask=chunk.t_rel <= 0.0
    )
    assert_state_close(base_pre, base_seq)


def test_prefix_oracle_covariance(rng):
    """Long horizon: prefix covariance tracks the sequential one tightly
    even after 200 samples of f32 regrouping."""
    state = eskf.init_state(CFG)
    for _ in range(5):
        chunk = make_chunk(rng, 40, t_end_frac=1.0)
        final_seq, _ = eskf.predict_chunk(state, chunk, NOISE)
        final_pre, _ = eskf.predict_chunk_prefix(state, chunk, NOISE)
        np.testing.assert_allclose(
            np.asarray(final_pre.P),
            np.asarray(final_seq.P),
            rtol=5e-3,
            atol=1e-6,
        )
        state = final_pre
