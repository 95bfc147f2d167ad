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

    Args (device arrays; leading dim B = batch of scans):
      state, voxmap, prev_R, prev_t — carry as in the streaming step
      chunks: ImuChunk with leading dim B
      scans:  Scan with leading dim B
      evicts: [B] bool

    Returns (state, voxmap, prev_R, prev_t, poses_R [B,3,3], poses_t [B,3],
    diags stacked over B).
    """
    core = odo.make_step_core(config)

    def body(carry, inputs):
        (new_carry, diag) = core(carry, inputs)
        _, _, R, t = new_carry
        return new_carry, (R, t, diag)

    @jax.jit
    def replay(state, voxmap, prev_R, prev_t, chunks, scans, evicts):
        carry = (state, voxmap, prev_R, prev_t)
        carry, (Rs, ts, diags) = jax.lax.scan(
            body, carry, (chunks, scans, evicts)
        )
        state, voxmap, prev_R, prev_t = carry
        return state, voxmap, prev_R, prev_t, Rs, ts, diags

    return replay


def pack_sequence(
    config: Config, seq: Sequence, max_scans: int | None = None
) -> tuple[Scan, ImuChunk, Scan, np.ndarray, list[float]]:
    """Host-side packing of a Sequence into stacked replay inputs.

    Returns (init_scan, chunks [B,...], scans [B,...], evicts [B],
    scan_end_times).  The first scan is split out for the init path
    (ref `Odometry.cpp:55-63`); chunk i drives scan i+1.
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

    b = len(scans) - 1
    chunk_dt = np.zeros((b, m_cap), np.float32)
    chunk_trel = np.full((b, m_cap), np.inf, np.float32)
    chunk_gyro = np.zeros((b, m_cap, 3), np.float32)
    chunk_accel = np.zeros((b, m_cap, 3), np.float32)
    chunk_valid = np.zeros((b, m_cap), bool)
    scan_xyz = np.zeros((b, n_cap, 3), np.float32)
    scan_trel = np.zeros((b, n_cap), np.float32)
    scan_valid = np.zeros((b, n_cap), bool)
    evicts = np.zeros(b, bool)
    end_times = []

    imu = seq.imu
    t_prev = scans[0].end_time
    imu_idx = 0
    # skip IMU at/before the init scan end (ref `ErrorStateKF.cpp:66-69`)
    while imu_idx < len(imu) and imu[imu_idx].t <= t_prev:
        imu_idx += 1
    t_last_evict = -np.inf

    for i, rec in enumerate(scans[1:]):
        t_end = rec.end_time
        end_times.append(t_end)
        # chunk: samples in (t_prev, first sample > t_end]
        j = imu_idx
        prev_t = t_prev
        k = 0
        while j < len(imu) and k < m_cap:
            r = imu[j]
            chunk_dt[i, k] = r.t - prev_t
            chunk_trel[i, k] = r.t - t_end
            chunk_gyro[i, k] = r.gyro
            chunk_accel[i, k] = r.accel
            chunk_valid[i, k] = True
            prev_t = r.t
            k += 1
            j += 1
            if r.t > t_end:
                break
        # next chunk re-propagates overhang from the corrected state:
        # consume only samples with t <= t_end
        while imu_idx < len(imu) and imu[imu_idx].t <= t_end:
            imu_idx += 1
        t_prev = t_end

        xyz, trel, val = pack_scan_np(rec)
        scan_xyz[i] = xyz
        scan_trel[i] = trel
        scan_valid[i] = val

        if (
            config.remove_distant_points
            and t_end - t_last_evict >= config.remove_period
        ):
            evicts[i] = True
            t_last_evict = t_end

    chunks = ImuChunk(
        dt=jnp.asarray(chunk_dt),
        t_rel=jnp.asarray(chunk_trel),
        gyro=jnp.asarray(chunk_gyro),
        accel=jnp.asarray(chunk_accel),
        valid=jnp.asarray(chunk_valid),
    )
    scans_stacked = Scan(
        points=jnp.asarray(scan_xyz),
        t_rel=jnp.asarray(scan_trel),
        valid=jnp.asarray(scan_valid),
    )
    return init_scan, chunks, scans_stacked, jnp.asarray(evicts), end_times


def run_replay(
    config: Config,
    seq: Sequence,
    init_state: FilterState | None = None,
    max_scans: int | None = None,
    batch: int | None = None,
):
    """Full offline run.  Returns (positions [S,3], rotations [S,3,3],
    diags dict of stacked arrays, final voxmap)."""
    init_scan, chunks, scans, evicts, _ = pack_sequence(
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
        )
        Rs_all.append(Rs)
        ts_all.append(ts)
        diags_all.append(diags)

    positions = np.concatenate(
        [np.zeros((1, 3))] + [np.asarray(t) for t in ts_all]
    )
    rotations = np.concatenate(
        [np.eye(3)[None]] + [np.asarray(r) for r in Rs_all]
    )
    diags = {
        k: np.concatenate([np.asarray(d[k]) for d in diags_all])
        for k in diags_all[0]
    }
    return positions, rotations, diags, voxmap
