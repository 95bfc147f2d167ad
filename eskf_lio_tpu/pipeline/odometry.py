"""Odometry orchestration.

Re-designs the reference main loop (`/root/reference/src/Odometry.cpp:9-110`)
for the XLA execution model: the entire per-scan hot path — IMU-chunk
prediction, deskew/downsample/covariances, VGICP alignment, ESKF update, map
insert/evict — is ONE jitted function (`make_scan_step`) over device-resident
pytrees.  The host does only what ROS threads + SynchronizedQueues do in the
reference: buffering, f64 timekeeping, chunk building, and gating (waiting
for IMU coverage of the scan end, `Odometry.cpp:65-69`).

Reference behaviours carried over:
* first-scan initialisation: filter clock set to scan end, scan preprocessed
  with no deskew, inserted into the map at identity (`Odometry.cpp:55-63`);
* frame-to-frame motion gate on map insertion (`LocalMap.cpp:39,132-147`:
  insert when cos θ < cosine_threshold OR ‖t‖² > translation_sq_threshold,
  with `prevTransform_` updated every frame regardless);
* distant-voxel eviction every `remove_period` — keyed on *sensor* time, a
  deliberate fix of the reference's wall-clock period (`LocalMap.cpp:60`);
* per-stage timing summary (`Odometry.cpp:99-109`) via utils/profiling.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.io.dataset import LidarRecord, Sequence
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration
from eskf_lio_tpu.ops import lie, preprocess
from eskf_lio_tpu.types import (
    FilterState,
    ImuChunk,
    Pose,
    ProcessedScan,
    Scan,
    StateHistory,
)


def lidar_extrinsics(config: Config, dtype=jnp.float32) -> Pose:
    """T_il from config quaternion (xyzw, ref `hilti_config.yaml:22-23`)."""
    qx, qy, qz, qw = config.lidar_quat_xyzw
    q = jnp.asarray([qw, qx, qy, qz], dtype)
    return Pose(
        R=lie.quat_to_mat(lie.quat_normalize(q)),
        t=jnp.asarray(config.lidar_translation, dtype),
    )


# ---------------------------------------------------------------------------
# jitted per-scan step
# ---------------------------------------------------------------------------


def make_step_core(config: Config) -> Callable:
    """The fused per-scan step body, shaped as a `lax.scan`-compatible
    function: core(carry, inputs) -> (carry, outputs) with
    carry = (FilterState, VoxelMap, prev_R, prev_t) and
    inputs = (ImuChunk, Scan, do_evict).  Used both for the streaming
    single-call step (`make_scan_step`) and the device-resident replay loop
    (`pipeline.replay`)."""
    noise = eskf.make_noise_params(config)
    T_il = lidar_extrinsics(config)

    def core(carry, inputs):
        state, voxmap, prev_R, prev_t = carry
        chunk, scan, do_evict = inputs

        # 1+2. predict through the chunk and obtain the state at the last
        # sample before scan end in one parallel-prefix pass (replaces the
        # reference's per-sample process() + rollback,
        # `Odometry.cpp:28-34` / `ErrorStateKF.cpp:120-126`)
        base, hist = eskf.predict_chunk_prefix(
            state, chunk, noise, base_mask=chunk.t_rel <= 0.0
        )

        # 3. preprocess (ref `Odometry.cpp:74`)
        processed = preprocess.preprocess(scan, hist, T_il, config)

        # 4. VGICP alignment from the base pose (ref `ErrorStateKF.cpp:127-130`)
        # over the align-budget prefix: live voxels are a contiguous
        # ascending-key prefix of the processed scan, so this is a free
        # static slice; the per-iteration map lookup is latency-bound per
        # query row (~96 % of align), so fewer rows ≈ proportionally
        # cheaper.  Insert below still uses the full scan (no map loss);
        # live voxels beyond the budget lose correspondence only and are
        # counted in `align_slice_overflow` (~0 at shipped capacities).
        guess = eskf.pose_of(base)
        a_cap = config.align_capacity
        if a_cap < config.max_scan_points:
            aligned_scan = ProcessedScan(
                points=processed.points[:a_cap],
                covs=processed.covs[:a_cap],
                valid=processed.valid[:a_cap],
            )
        else:
            aligned_scan = processed
        res = registration.align(aligned_scan, voxmap, guess, config)

        # 5. measurement update (ref `ErrorStateKF.cpp:132-145`)
        corrected = eskf.pose_update(base, res.pose, noise)
        T = eskf.pose_of(corrected)

        # 6. map update with motion gate (ref `LocalMap.cpp:39-58,132-147`)
        moved_R = jnp.einsum(
            "ji,jk->ik", prev_R, T.R, precision="highest"
        )
        moved_t = jnp.einsum(
            "ji,j->i", prev_R, T.t - prev_t, precision="highest"
        )
        cosine = 0.5 * (jnp.trace(moved_R) - 1.0)
        should_insert = jnp.logical_or(
            cosine < config.map_update_cosine_threshold,
            jnp.sum(moved_t * moved_t)
            > config.map_update_translation_sq_threshold,
        )
        pts_world = T.apply(processed.points)
        insert_mask = jnp.logical_and(processed.valid, should_insert)
        voxmap, dropped = vm.insert(
            voxmap,
            pts_world,
            vm.pack_cov(
                jnp.einsum(
                    "ab,nbc,dc->nad", T.R, processed.covs, T.R,
                    precision="highest",
                )
            ),
            insert_mask,
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel
        )

        # 7. periodic distant-voxel eviction (ref `LocalMap.cpp:60-72`)
        def evict(m):
            return vm.evict_beyond(
                m,
                T.t,
                voxel_size=config.map_voxel_size,
                distance_threshold=config.remove_distance_threshold,
                max_points_per_voxel=config.max_points_per_voxel,
            )

        voxmap, removed = jax.lax.cond(
            jnp.logical_and(do_evict, jnp.asarray(config.remove_distant_points)),
            evict,
            lambda m: (m, jnp.asarray(0, jnp.int32)),
            voxmap,
        )

        diag = {
            "icp_iterations": res.iterations,
            "icp_converged": res.converged,
            "num_correspondences": res.num_correspondences,
            "inserted": should_insert,
            "dropped_points": dropped,
            "removed_voxels": removed,
            "num_scan_points": jnp.sum(processed.valid.astype(jnp.int32)),
            "align_slice_overflow": jnp.maximum(
                jnp.sum(processed.valid.astype(jnp.int32)) - a_cap, 0
            ),
            # failure detection (absent in the reference, SURVEY.md 5.3):
            # a non-finite pose means the filter diverged
            "pose_finite": jnp.logical_and(
                jnp.all(jnp.isfinite(T.t)), jnp.all(jnp.isfinite(T.R))
            ),
        }
        return (corrected, voxmap, T.R, T.t), diag

    return core


def make_scan_step(config: Config) -> Callable:
    """Build the fused per-scan device step.  Closes over all static config
    so repeated calls hit one compiled executable."""
    core = make_step_core(config)

    @jax.jit
    def scan_step(
        state: FilterState,
        voxmap: vm.VoxelMap,
        prev_R: jnp.ndarray,
        prev_t: jnp.ndarray,
        chunk: ImuChunk,
        scan: Scan,
        do_evict: jnp.ndarray,  # bool scalar
    ):
        (corrected, voxmap, R, t), diag = core(
            (state, voxmap, prev_R, prev_t), (chunk, scan, do_evict)
        )
        return corrected, voxmap, R, t, diag

    return scan_step


def make_init_step(config: Config) -> Callable:
    """First-scan path (ref `Odometry.cpp:55-63`): preprocess with no state
    history (no deskew) and insert into the map at the identity pose."""
    T_il = lidar_extrinsics(config)

    @jax.jit
    def init_step(voxmap: vm.VoxelMap, scan: Scan):
        pts_imu = T_il.apply(scan.points)
        processed = preprocess.downsample_and_covariances(
            pts_imu, scan.valid, config
        )
        voxmap, dropped = vm.insert(
            voxmap,
            processed.points,
            vm.pack_cov(processed.covs),
            processed.valid,
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel
        )
        return voxmap, dropped

    return init_step


def make_predict_only(config: Config) -> Callable:
    """Overflow path: advance the filter through a chunk without a scan
    (used when more IMU samples accumulate than one chunk holds)."""
    noise = eskf.make_noise_params(config)

    @jax.jit
    def predict_only(state: FilterState, chunk: ImuChunk):
        final, _ = eskf.predict_chunk_prefix(state, chunk, noise)
        return final

    return predict_only


# ---------------------------------------------------------------------------
# host orchestrator
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class StageTimer:
    """avg/max wall timing, mirroring the reference's report
    (`Odometry.cpp:10-14,99-109`)."""

    total: float = 0.0
    max: float = 0.0
    count: int = 0

    def add(self, dt: float) -> None:
        self.total += dt
        self.max = max(self.max, dt)
        self.count += 1

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


class Odometry:
    """Host-side driver: feeds measurement streams into the device step and
    records the trajectory.  Single-device; the sharded variant lives in
    `parallel/`."""

    def __init__(self, config: Config, init_state: FilterState | None = None):
        self.config = config
        self.scan_step = make_scan_step(config)
        self.init_step = make_init_step(config)
        self.predict_only = make_predict_only(config)

        self.state = init_state if init_state is not None else eskf.init_state(config)
        self.voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
        self.prev_R = jnp.eye(3)
        self.prev_t = jnp.zeros(3)

        self.initialized = False
        self.t_last_update: float = 0.0  # f64 host clock of the filter state
        self.t_last_evict: float = -np.inf
        self.imu_pending: list = []  # records with t > t_last_update

        self.trajectory_t: list[float] = []
        self.trajectory_p: list[np.ndarray] = []
        self.trajectory_R: list[np.ndarray] = []
        self.diags: list[dict] = []
        self.timer = StageTimer()

        # failure detection (the reference has none, SURVEY.md 5.3): flag
        # divergence on a non-finite pose or a sustained loss of map
        # correspondences so callers can stop/reset instead of silently
        # corrupting the map
        self.diverged = False
        self.zero_corr_streak = 0
        self.zero_corr_limit = 10

    # -- chunk/scan packing ------------------------------------------------

    def _build_chunk(self, records, t_end: float) -> ImuChunk:
        m = self.config.max_imu_per_scan
        n = len(records)
        assert n <= m, f"chunk overflow: {n} > {m}"
        dt = np.zeros(m, np.float32)
        t_rel = np.full(m, np.inf, np.float32)
        gyro = np.zeros((m, 3), np.float32)
        accel = np.zeros((m, 3), np.float32)
        valid = np.zeros(m, bool)
        prev_t = self.t_last_update
        for i, r in enumerate(records):
            dt[i] = r.t - prev_t
            t_rel[i] = r.t - t_end
            gyro[i] = r.gyro
            accel[i] = r.accel
            valid[i] = True
            prev_t = r.t
        return ImuChunk(
            dt=jnp.asarray(dt),
            t_rel=jnp.asarray(t_rel),
            gyro=jnp.asarray(gyro),
            accel=jnp.asarray(accel),
            valid=jnp.asarray(valid),
        )

    def _build_scan(self, rec: LidarRecord) -> tuple[Scan, int]:
        # pad/truncate into the fixed device layout — the C++ fast path
        # when the native runtime is built, numpy otherwise.  Returns the
        # scan AND the number of raw points dropped by the capacity cut
        # (the reference never drops, `Subscriber.hpp:89-97` — a static
        # budget must, so the loss is surfaced, not silent).
        from eskf_lio_tpu.io import native_runtime

        xyz, t_rel, valid, n_packed = native_runtime.pack_scan(
            rec.points, rec.t, rec.end_time, self.config.max_raw_points
        )
        dropped_raw = max(len(rec.points) - int(n_packed), 0)
        scan = Scan(
            points=jnp.asarray(xyz),
            t_rel=jnp.asarray(t_rel),
            valid=jnp.asarray(valid),
        )
        return scan, dropped_raw

    # -- main entry --------------------------------------------------------

    def feed_imu(self, rec) -> None:
        self.imu_pending.append(rec)

    def process_scan(self, rec: LidarRecord) -> dict | None:
        """Process one LiDAR sweep; returns the diagnostics dict, or None if
        the scan is not yet covered by IMU (caller should feed more IMU and
        retry — the reference's gating loop, `Odometry.cpp:65-69`)."""
        t_end = rec.end_time

        if not self.initialized:
            # ref `Odometry.cpp:55-63`
            self.initialized = True
            self.t_last_update = t_end
            # eviction clock starts at the first scan (ref `LocalMap.cpp:60`
            # keys its period off construction time): the first eviction
            # fires `remove_period` after start, not on scan 1
            self.t_last_evict = t_end
            # drop IMU before the first scan end (ref `ErrorStateKF.cpp:66-69`)
            self.imu_pending = [r for r in self.imu_pending if r.t >= t_end]
            scan, _ = self._build_scan(rec)
            self.voxmap, _ = self.init_step(self.voxmap, scan)
            self._record(t_end, np.eye(3), np.zeros(3), None)
            self.prev_R = jnp.eye(3)
            self.prev_t = jnp.zeros(3)
            return {"initialized": True}

        # drop records predating the filter clock (ref drops IMU before
        # the first scan end, `ErrorStateKF.cpp:66-69`, and negative-dt
        # samples, `:80-82`).  The init-time drop only sees what has
        # ARRIVED; under a racing ingest thread, pre-init samples can land
        # after init and would otherwise bloat this chunk past its static
        # capacity (spurious overflow pre-advance — round-5 streaming
        # equivalence failure under host load).
        if self.imu_pending and self.imu_pending[0].t <= self.t_last_update:
            self.imu_pending = [
                r for r in self.imu_pending if r.t > self.t_last_update
            ]

        # gating: need at least one IMU sample at/after scan end
        if not self.imu_pending or self.imu_pending[-1].t < t_end:
            return None

        t0 = time.perf_counter()

        # split pending: chunk = all samples up to and incl. first > t_end
        idx_over = next(
            i for i, r in enumerate(self.imu_pending) if r.t > t_end
        ) if any(r.t > t_end for r in self.imu_pending) else len(self.imu_pending) - 1
        chunk_records = self.imu_pending[: idx_over + 1]
        m = self.config.max_imu_per_scan

        # overflow: pre-advance through all but the last window
        while len(chunk_records) > m:
            head, chunk_records = chunk_records[: m], chunk_records[m:]
            c = self._build_chunk(head, t_end)
            self.state = self.predict_only(self.state, c)
            self.t_last_update = head[-1].t

        chunk = self._build_chunk(chunk_records, t_end)
        scan, dropped_raw = self._build_scan(rec)

        do_evict = (
            self.config.remove_distant_points
            and t_end - self.t_last_evict >= self.config.remove_period
        )

        self.state, self.voxmap, self.prev_R, self.prev_t, diag = self.scan_step(
            self.state,
            self.voxmap,
            self.prev_R,
            self.prev_t,
            chunk,
            scan,
            jnp.asarray(do_evict),
        )

        # next chunk re-propagates overhang samples from the corrected state
        # (replaces the reference's rollback+replay, `ErrorStateKF.cpp:147-155`)
        self.t_last_update = t_end
        self.imu_pending = [r for r in self.imu_pending if r.t > t_end]
        if do_evict:
            self.t_last_evict = t_end

        pose_R = np.asarray(self.prev_R)
        pose_t = np.asarray(self.prev_t)
        self.timer.add(time.perf_counter() - t0)
        diag_host = {k: np.asarray(v) for k, v in diag.items()}
        # raw points that never reached the device (non-finite or beyond
        # `max_raw_points`) — a silent-data-loss channel made visible
        diag_host["dropped_raw_points"] = np.asarray(dropped_raw)
        if not bool(diag_host.get("pose_finite", True)):
            self.diverged = True
        if int(diag_host.get("num_correspondences", 1)) == 0:
            self.zero_corr_streak += 1
            if self.zero_corr_streak >= self.zero_corr_limit:
                self.diverged = True
        else:
            self.zero_corr_streak = 0
        self._record(t_end, pose_R, pose_t, diag_host)
        return diag_host

    def run(
        self,
        seq: Sequence,
        max_scans: int | None = None,
        on_scan=None,
    ) -> dict:
        """Run a full sequence (merged time-ordered replay of both streams).
        `on_scan(self)` fires after each processed scan (live viz hook,
        the role of the reference's per-loop `visualizeLocalMap`,
        `LocalMap.cpp:120-130`).  Returns summary stats."""
        imu_iter = iter(seq.imu)
        next_imu = next(imu_iter, None)
        n_done = 0
        for scan in seq.scans:
            if max_scans is not None and n_done >= max_scans:
                break
            # feed IMU until the scan is covered
            while next_imu is not None and next_imu.t <= scan.end_time + 0.05:
                self.feed_imu(next_imu)
                next_imu = next(imu_iter, None)
            out = self.process_scan(scan)
            if out is None:
                # stream exhausted without coverage: stop
                break
            n_done += 1
            if on_scan is not None:
                on_scan(self)
        return self.summary()

    def _record(self, t, R, p, diag) -> None:
        self.trajectory_t.append(float(t))
        self.trajectory_R.append(np.asarray(R))
        self.trajectory_p.append(np.asarray(p))
        if diag is not None:
            self.diags.append(diag)

    def summary(self) -> dict:
        return {
            "diverged": self.diverged,
            "num_scans": len(self.trajectory_t),
            "avg_step_ms": self.timer.avg * 1e3,
            "max_step_ms": self.timer.max * 1e3,
            "scans_per_sec": 1.0 / self.timer.avg if self.timer.count else 0.0,
            "map_voxels": int(self.voxmap.num_voxels()),
        }

    @property
    def positions(self) -> np.ndarray:
        return np.stack(self.trajectory_p) if self.trajectory_p else np.zeros((0, 3))
