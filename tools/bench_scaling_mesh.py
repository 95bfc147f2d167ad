"""Virtual-mesh scaling curve of the sharded LIO step (SCALING.md input).

Real multi-chip hardware is not reachable from this environment, so this
measures the two things that CAN be measured and that together bound the
multi-chip story:

  1. per-device WORK SHRINKS like N/D: wall-clock of the sharded step on a
     D-device virtual CPU mesh for D = 1, 2, 4, 8
     (`--xla_force_host_platform_device_count`, the standard JAX way to
     exercise mesh code without hardware).  CPU absolute times are NOT TPU
     times — the curve's shape (how per-step time falls with D) is the
     datapoint, because the per-device slice capacities
     (`slice_capacity(N, D, slack)`) and map shards (C/D rows) scale
     exactly 1/D while the replicated 6x6 solve stays constant.
  2. the COMMUNICATION that would ride ICI is a fixed 43-float psum per GN
     iteration (JTJ 36 + JTr 6 + count 1, `parallel/sharded_map.py`), plus
     a handful of scalar psums per scan — microseconds of ICI time,
     independent of D.

Usage:  python tools/bench_scaling_mesh.py  (forces the CPU platform)
Prints one JSON line per D.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.parallel import sharded_map as sh
from eskf_lio_tpu.pipeline import odometry as odo


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        max_raw_points=16384,
        max_scan_points=8192,
        max_imu_per_scan=48,
        hash_capacity_log2=16,
    )
    seq = dataset.make_synthetic_sequence(
        duration=1.6, points_per_scan=12000, seed=3
    )

    for n_dev in (1, 2, 4, 8):
        runner = sh.ShardedOdometry(config, n_devices=n_dev)
        # warm the pipeline + map on a few scans (includes compile)
        recs = seq.scans
        for r in seq.imu:
            runner.feed_imu(r)
        for rec in recs[:3]:
            runner.process_scan(rec)

        # timed: remaining scans (host loop; CPU dispatch overhead is
        # small relative to the CPU step cost)
        timed = recs[3 : 3 + k]
        t0 = time.perf_counter()
        for rec in timed:
            runner.process_scan(rec)
        dt = (time.perf_counter() - t0) / len(timed)
        s_cap = sh.slice_capacity(
            config.max_scan_points, n_dev, config.shard_slack
        )
        print(json.dumps({
            "devices": n_dev,
            "ms_per_scan": round(dt * 1e3, 1),
            "per_device_slice": s_cap,
            "per_device_map_rows": config.hash_capacity // n_dev,
        }), flush=True)


if __name__ == "__main__":
    main()
