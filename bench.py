"""Benchmark: full LIO loop throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: a Hilti-class synthetic sequence (20k-point sweeps at 10 Hz,
400 Hz IMU — exp21's sensor rates, `BASELINE.md`), processed by the
device-resident replay loop (`pipeline/replay.py`): the whole batch of LIO
frames — deskew, downsample, covariances, VGICP Gauss-Newton, ESKF update,
voxel-map insert/evict — runs under one `lax.scan` dispatch on device.

Timing: the device is synchronised by fetching a scalar from the final
state (async dispatch acks are NOT trusted).  Warmup batch first so compile
time is excluded.

Baseline denominator: the reference (C++/OpenMP, `Odometry.cpp:99-109`)
publishes no numbers and cannot run here (no ROS/Open3D); the 10 Hz sensor
rate is the bar it must sustain to be usable, so vs_baseline = measured
scans/sec / 10 — i.e. vs_baseline >= 5 corresponds to BASELINE.md's >=5x
target under the conservative assumption the reference runs at real time.
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

SCAN_RATE_HZ = 10.0  # Hesai Pandar real-time rate on exp21


def main() -> None:
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-3,
        rotation_noise=3e-4,
        max_raw_points=24576,
        max_scan_points=12288,
        max_imu_per_scan=64,
        hash_capacity_log2=19,
        map_delta_log2=14,
    )
    import numpy as _np

    seq = dataset.make_synthetic_sequence(
        duration=13.0, points_per_scan=20000, seed=11,
        # realistic sensor imperfections (datasheet-level noise + biases) —
        # the filter models them, so the workload should contain them
        imu_noise_gyro=4.9e-3, imu_noise_accel=0.0206,
        gyro_bias=_np.array([0.002, -0.001, 0.0015]),
        accel_bias=_np.array([0.02, -0.03, 0.01]),
    )

    init_scan, chunks, scans, evicts, updates, _ = replay.pack_sequence(
        config, seq
    )
    init_step = odo.make_init_step(config)
    replay_step = replay.make_replay_step(config)

    state = eskf.init_state(config)
    voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
    voxmap, _ = init_step(voxmap, init_scan)
    prev_R, prev_t = jnp.eye(3), jnp.zeros(3)

    b_total = chunks.dt.shape[0]
    assert b_total >= 64, "sequence too short for a timed window"
    # warmup and timed batches MUST have identical shapes: a different batch
    # length would retrace and the timed region would include compilation
    n = b_total // 2
    sl = lambda a, s, e: jax.tree.map(lambda x: x[s:e], a)

    # warmup (includes compile); sync via scalar fetch — async acks lie
    state, voxmap, prev_R, prev_t, _, ts_w, _ = replay_step(
        state, voxmap, prev_R, prev_t,
        sl(chunks, 0, n), sl(scans, 0, n), evicts[:n], updates[:n],
    )
    float(np.asarray(ts_w[-1, 0]))

    # timed region: same-shaped second half in one dispatch
    t0 = time.perf_counter()
    state, voxmap, prev_R, prev_t, _, ts_b, diags = replay_step(
        state, voxmap, prev_R, prev_t,
        sl(chunks, n, 2 * n), sl(scans, n, 2 * n),
        evicts[n : 2 * n], updates[n : 2 * n],
    )
    float(np.asarray(ts_b[-1, 0]))  # device sync
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
