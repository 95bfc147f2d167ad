"""Threaded streaming pipeline vs the synchronous driver."""

import numpy as np

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline.odometry import Odometry
from eskf_lio_tpu.pipeline.stream import StreamingRunner, merged_stream

CFG = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    max_raw_points=8192,
    max_scan_points=4096,
    max_imu_per_scan=48,
    hash_capacity_log2=16,
)


def test_streaming_matches_synchronous():
    seq = dataset.make_synthetic_sequence(
        duration=2.0, points_per_scan=8000, seed=7
    )
    sync = Odometry(CFG)
    sync.run(seq)

    runner = StreamingRunner(CFG)
    summary = runner.run(merged_stream(seq))
    assert summary["num_scans"] == len(sync.trajectory_t)
    # the two runs execute the same jitted step on identical inputs, but
    # XLA:CPU multithreaded reductions are not run-to-run deterministic
    # and the ~1e-7 partial-sum differences amplify chaotically through
    # the GN/filter recursion — the bound is a trajectory-scale sanity
    # margin, not bit parity (same rationale as test_replay)
    np.testing.assert_allclose(
        runner.odo.positions, sync.positions, atol=1e-2
    )
    assert not summary["diverged"]


def test_streaming_max_scans():
    seq = dataset.make_synthetic_sequence(
        duration=2.0, points_per_scan=8000, seed=7
    )
    runner = StreamingRunner(CFG)
    summary = runner.run(merged_stream(seq), max_scans=5)
    assert summary["num_scans"] == 5
