"""Threaded streaming pipeline vs the synchronous driver.

Deterministic threading-equivalence design (round-5 deflake): the property
the two-thread pipeline must guarantee is that the *filter sees identical
inputs* — every scan processed once, in order, with the same IMU chunk and
evict schedule as the synchronous driver.  Those inputs are a pure function
of the record stream (the coverage gate blocks until all IMU <= t_end has
arrived), so they can be compared BITWISE regardless of host load.
Trajectories, by contrast, are NOT comparable run-to-run at any fixed
tolerance: XLA:CPU multithreaded reductions are nondeterministic and the
~1e-7 partial-sum noise amplifies chaotically through the GN/filter
recursion (the round-4 full-suite flake).  Output sanity is asserted
against ground truth instead.
"""

import hashlib

import numpy as np

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline.odometry import Odometry
from eskf_lio_tpu.pipeline.stream import StreamingRunner, merged_stream
from eskf_lio_tpu.utils.metrics import ate_rmse

CFG = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    max_raw_points=8192,
    max_scan_points=4096,
    max_imu_per_scan=48,
    hash_capacity_log2=16,
)


def _record_step_inputs(odo: Odometry, log: list) -> None:
    """Wrap the jitted scan step to log a digest of its stream-derived
    inputs (IMU chunk, scan, evict flag) — NOT the carried state/map, which
    feed back XLA:CPU reduction nondeterminism.

    Chunk rows are masked to `valid & t_rel <= 0` before hashing: whether
    the first IMU sample BEYOND scan end is already in the chunk depends on
    arrival timing (the sync driver's 50 ms lookahead vs the streaming
    gate), but such overhang rows only populate `t_rel > 0` history slots
    that deskew never gathers (all point times <= scan end) and are
    re-propagated from the corrected state next chunk — so the consumed
    input is exactly the masked prefix."""
    inner = odo.scan_step

    def wrapped(state, voxmap, prev_R, prev_t, chunk, scan, do_evict):
        h = hashlib.sha1()
        m = np.asarray(chunk.valid) & (np.asarray(chunk.t_rel) <= 0.0)
        for arr in (chunk.dt, chunk.t_rel, chunk.gyro, chunk.accel):
            a = np.ascontiguousarray(np.asarray(arr))
            mm = m.reshape(m.shape + (1,) * (a.ndim - m.ndim))
            a = np.where(mm, a, 0)  # not a*mask: padding rows may hold inf
            h.update(np.ascontiguousarray(a).tobytes())
        h.update(m.tobytes())
        for arr in (*scan, do_evict):
            h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
        log.append(h.hexdigest())
        return inner(state, voxmap, prev_R, prev_t, chunk, scan, do_evict)

    odo.scan_step = wrapped


def test_streaming_matches_synchronous():
    seq = dataset.make_synthetic_sequence(
        duration=2.0, points_per_scan=8000, seed=7
    )
    sync = Odometry(CFG)
    sync_inputs: list = []
    _record_step_inputs(sync, sync_inputs)
    sync.run(seq)

    runner = StreamingRunner(CFG)
    stream_inputs: list = []
    _record_step_inputs(runner.odo, stream_inputs)
    summary = runner.run(merged_stream(seq))

    # exact equivalence: same scans, same order, bitwise-identical IMU
    # chunks / scan tensors / evict schedule
    assert summary["num_scans"] == len(sync.trajectory_t)
    assert stream_inputs == sync_inputs
    assert not summary["diverged"]

    # output sanity: the streamed run tracks ground truth on its own
    gt = seq.gt_positions[: len(runner.odo.positions)]
    assert ate_rmse(runner.odo.positions, gt, align=True) < 0.1


def test_streaming_max_scans():
    seq = dataset.make_synthetic_sequence(
        duration=2.0, points_per_scan=8000, seed=7
    )
    runner = StreamingRunner(CFG)
    summary = runner.run(merged_stream(seq), max_scans=5)
    assert summary["num_scans"] == 5
