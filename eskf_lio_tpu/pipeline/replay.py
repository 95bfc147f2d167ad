"""Device-resident replay: the offline / throughput execution mode.

The streaming driver (`pipeline.odometry.Odometry`) makes one device call
per scan — right for online use, but each call pays host↔device dispatch
latency (severe over a tunneled device, non-zero even locally).  Replay mode
packs B scans of a sequence into stacked device arrays and runs the SAME
per-scan step body (`make_step_core`) under one `lax.scan`: a whole batch of
LIO frames per dispatch, with zero host round-trips in between.

This is the framework's throughput path (the bench uses it) and the natural
shape for offline mapping runs — the reference has no equivalent because a
CPU pipeline has no dispatch boundary to amortise.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.io.dataset import Sequence
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.types import FilterState, ImuChunk, Scan


def make_replay_step(config: Config) -> Callable:
    """jit'd runner: processes a whole stacked batch of scans in one call.

    Args (device arrays; leading dim B = batch of rows):
      state, voxmap, prev_R, prev_t — carry as in the streaming step
      chunks: ImuChunk with leading dim B
      scans:  Scan with leading dim B
      evicts: [B] bool
      updates: [B] bool — True for real scan rows; False rows are
        predict-only overflow rows (streaming `predict_only` semantics,
        ref IMU replay `ErrorStateKF.cpp:147-155`): the filter advances
        through the chunk, the map/pose carry passes through untouched.

    Returns (state, voxmap, prev_R, prev_t, poses_R [B,3,3], poses_t [B,3],
    diags stacked over B).
    """
    core = odo.make_step_core(config)
    noise = eskf.make_noise_params(config)

    def predict_branch(carry, inputs):
        state, voxmap, prev_R, prev_t = carry
        chunk, _scan, _evict = inputs
        final, _ = eskf.predict_chunk_prefix(state, chunk, noise)
        diag = {
            "icp_iterations": jnp.asarray(0, jnp.int32),
            "icp_converged": jnp.asarray(True),
            "num_correspondences": jnp.asarray(0, jnp.int32),
            "inserted": jnp.asarray(False),
            "dropped_points": jnp.asarray(0, jnp.int32),
            "removed_voxels": jnp.asarray(0, jnp.int32),
            "num_scan_points": jnp.asarray(0, jnp.int32),
            "align_slice_overflow": jnp.asarray(0, jnp.int32),
            "pose_finite": jnp.logical_and(
                jnp.all(jnp.isfinite(final.p)), jnp.all(jnp.isfinite(final.q))
            ),
        }
        return (final, voxmap, prev_R, prev_t), (prev_R, prev_t, diag)

    def update_branch(carry, inputs):
        (new_carry, diag) = core(carry, inputs)
        _, _, R, t = new_carry
        return new_carry, (R, t, diag)

    def body(carry, inputs):
        chunk, scan, evict, do_update = inputs
        return jax.lax.cond(
            do_update,
            update_branch,
            predict_branch,
            carry,
            (chunk, scan, evict),
        )

    @jax.jit
    def replay(state, voxmap, prev_R, prev_t, chunks, scans, evicts, updates):
        carry = (state, voxmap, prev_R, prev_t)
        carry, (Rs, ts, diags) = jax.lax.scan(
            body, carry, (chunks, scans, evicts, updates)
        )
        state, voxmap, prev_R, prev_t = carry
        return state, voxmap, prev_R, prev_t, Rs, ts, diags

    return replay


def pack_sequence(
    config: Config, seq: Sequence, max_scans: int | None = None
) -> tuple[Scan, ImuChunk, Scan, np.ndarray, np.ndarray, list[float]]:
    """Host-side packing of a Sequence into stacked replay inputs.

    Returns (init_scan, chunks [B,...], scans [B,...], evicts [B],
    updates [B], scan_end_times).  The first scan is split out for the init
    path (ref `Odometry.cpp:55-63`).  B ≥ number of scans − 1: when a scan
    interval holds more IMU samples than `max_imu_per_scan`, the overflow
    windows become extra predict-only rows (updates=False) — the exact
    streaming `predict_only` pre-advance semantics
    (`pipeline.odometry.Odometry.process_scan`), so a LiDAR gap can never
    silently drop IMU samples.
    """
    n_cap = config.max_raw_points
    m_cap = config.max_imu_per_scan

    def pack_scan_np(rec):
        pts = rec.points[:n_cap]
        t_rel = (rec.t[:n_cap] - rec.end_time).astype(np.float32)
        n = len(pts)
        pad = n_cap - n
        return (
            np.vstack([pts, np.zeros((pad, 3), np.float32)]),
            np.concatenate([t_rel, np.zeros(pad, np.float32)]),
            np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
        )

    scans = seq.scans if max_scans is None else seq.scans[:max_scans]
    init_xyz, init_t, init_valid = pack_scan_np(scans[0])
    init_scan = Scan(
        points=jnp.asarray(init_xyz),
        t_rel=jnp.asarray(init_t),
        valid=jnp.asarray(init_valid),
    )

    # rows accumulate as lists (overflow inserts extra predict-only rows)
    rows_dt, rows_trel, rows_gyro, rows_accel, rows_valid = [], [], [], [], []
    rows_scan = []  # (xyz, trel, valid) or None for predict-only rows
    rows_evict, rows_update = [], []
    end_times = []
    zero_scan = (
        np.zeros((n_cap, 3), np.float32),
        np.zeros(n_cap, np.float32),
        np.zeros(n_cap, bool),
    )

    def emit_row(records, t_end, prev_t, scan_np, evict):
        dt = np.zeros(m_cap, np.float32)
        trel = np.full(m_cap, np.inf, np.float32)
        gyro = np.zeros((m_cap, 3), np.float32)
        accel = np.zeros((m_cap, 3), np.float32)
        valid = np.zeros(m_cap, bool)
        for k, r in enumerate(records):
            dt[k] = r.t - prev_t
            trel[k] = r.t - t_end
            gyro[k] = r.gyro
            accel[k] = r.accel
            valid[k] = True
            prev_t = r.t
        rows_dt.append(dt)
        rows_trel.append(trel)
        rows_gyro.append(gyro)
        rows_accel.append(accel)
        rows_valid.append(valid)
        rows_scan.append(scan_np if scan_np is not None else zero_scan)
        rows_evict.append(evict)
        rows_update.append(scan_np is not None)
        return prev_t

    imu = seq.imu
    t_prev = scans[0].end_time
    imu_idx = 0
    # skip IMU at/before the init scan end (ref `ErrorStateKF.cpp:66-69`)
    while imu_idx < len(imu) and imu[imu_idx].t <= t_prev:
        imu_idx += 1
    # eviction clock starts at the init scan, matching
    # `Odometry.process_scan` (first eviction `remove_period` after start)
    t_last_evict = scans[0].end_time

    for rec in scans[1:]:
        t_end = rec.end_time
        end_times.append(t_end)
        # interval: all samples with t <= t_end, plus the first overhang
        # sample (its pose is needed for deskew past scan end)
        records = []
        j = imu_idx
        while j < len(imu):
            records.append(imu[j])
            j += 1
            if records[-1].t > t_end:
                break
        # next chunk re-propagates overhang from the corrected state:
        # consume only samples with t <= t_end
        while imu_idx < len(imu) and imu[imu_idx].t <= t_end:
            imu_idx += 1

        # overflow: pre-advance through all but the last window via
        # predict-only rows (streaming semantics,
        # `Odometry.process_scan` overflow loop)
        while len(records) > m_cap:
            head, records = records[:m_cap], records[m_cap:]
            t_prev = emit_row(head, t_end, t_prev, None, False)

        evict = bool(
            config.remove_distant_points
            and t_end - t_last_evict >= config.remove_period
        )
        if evict:
            t_last_evict = t_end
        emit_row(records, t_end, t_prev, pack_scan_np(rec), evict)
        t_prev = t_end

    chunks = ImuChunk(
        dt=jnp.asarray(np.stack(rows_dt)),
        t_rel=jnp.asarray(np.stack(rows_trel)),
        gyro=jnp.asarray(np.stack(rows_gyro)),
        accel=jnp.asarray(np.stack(rows_accel)),
        valid=jnp.asarray(np.stack(rows_valid)),
    )
    scans_stacked = Scan(
        points=jnp.asarray(np.stack([s[0] for s in rows_scan])),
        t_rel=jnp.asarray(np.stack([s[1] for s in rows_scan])),
        valid=jnp.asarray(np.stack([s[2] for s in rows_scan])),
    )
    return (
        init_scan,
        chunks,
        scans_stacked,
        jnp.asarray(np.asarray(rows_evict)),
        jnp.asarray(np.asarray(rows_update)),
        end_times,
    )


def run_replay(
    config: Config,
    seq: Sequence,
    init_state: FilterState | None = None,
    max_scans: int | None = None,
    batch: int | None = None,
):
    """Full offline run.  Returns (positions [S,3], rotations [S,3,3],
    diags dict of stacked arrays, final voxmap).  Predict-only overflow rows
    are filtered out of the returned trajectory/diags — outputs are indexed
    by scan, exactly like the streaming driver."""
    init_scan, chunks, scans, evicts, updates, _ = pack_sequence(
        config, seq, max_scans
    )
    init_step = odo.make_init_step(config)
    replay = make_replay_step(config)

    state = init_state if init_state is not None else eskf.init_state(config)
    voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
    voxmap, _ = init_step(voxmap, init_scan)

    prev_R = jnp.eye(3)
    prev_t = jnp.zeros(3)
    b_total = chunks.dt.shape[0]
    batch = batch or b_total

    Rs_all, ts_all, diags_all = [], [], []
    for s in range(0, b_total, batch):
        e = min(s + batch, b_total)
        sl = lambda a: a[s:e]
        state, voxmap, prev_R, prev_t, Rs, ts, diags = replay(
            state,
            voxmap,
            prev_R,
            prev_t,
            jax.tree.map(sl, chunks),
            jax.tree.map(sl, scans),
            evicts[s:e],
            updates[s:e],
        )
        Rs_all.append(Rs)
        ts_all.append(ts)
        diags_all.append(diags)

    keep = np.asarray(updates)
    positions = np.concatenate(
        [np.zeros((1, 3))] + [np.asarray(t) for t in ts_all]
    )[np.concatenate([[True], keep])]
    rotations = np.concatenate(
        [np.eye(3)[None]] + [np.asarray(r) for r in Rs_all]
    )[np.concatenate([[True], keep])]
    diags = {
        k: np.concatenate([np.asarray(d[k]) for d in diags_all])[keep]
        for k in diags_all[0]
    }
    return positions, rotations, diags, voxmap
