"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed CPU cluster running the sharded odometry step.

Launched as:  python tests/_dist_worker.py --coordinator localhost:PORT \
    --num-processes 2 --process-id I --out OUT.json
(env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2)
"""

import argparse
import json
import sys


def worker_config():
    from eskf_lio_tpu.config import Config, ImuConfig

    return Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-4,
        rotation_noise=3e-5,
        max_raw_points=2048,
        max_scan_points=1024,
        max_imu_per_scan=48,
        hash_capacity_log2=14,
    )


def make_seq():
    from eskf_lio_tpu.io import dataset

    return dataset.make_synthetic_sequence(
        duration=1.2, points_per_scan=1800, seed=7
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)  # shared path, all processes
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from eskf_lio_tpu.parallel import distributed as dist

    n, i = dist.initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert n == args.num_processes, (n, args.num_processes)
    n_global = len(jax.devices())
    assert n_global == 2 * args.num_processes, jax.devices()

    from eskf_lio_tpu.parallel.sharded_map import ShardedOdometry

    seq = make_seq()
    odo = ShardedOdometry(worker_config(), n_devices=n_global)
    odo.run(seq, max_scans=6)

    # checkpoint/resume across the multi-process mesh (SURVEY §5.4 +
    # round-4 Weak #8): snapshot a 3-scan run (collective — the sharded
    # map leaves allgather; only process 0 writes), restore into a fresh
    # sharded instance in every process, continue to scan 6, and compare
    # with the uninterrupted run above.
    import os

    from eskf_lio_tpu.utils import checkpoint as ckpt

    ckpt_dir = args.ckpt
    b = ShardedOdometry(worker_config(), n_devices=n_global)
    b.run(seq, max_scans=3)
    ckpt.save_checkpoint(ckpt_dir, b)
    # all processes wait for process 0's write before loading
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    c = ShardedOdometry(worker_config(), n_devices=n_global)
    ckpt.load_checkpoint(ckpt_dir, c)
    imu_rest = [r for r in seq.imu if r.t > c.t_last_update]
    it = iter(imu_rest)
    nxt = next(it, None)
    for scan in seq.scans[3:6]:
        while nxt is not None and nxt.t <= scan.end_time + 0.05:
            c.feed_imu(nxt)
            nxt = next(it, None)
        c.process_scan(scan)
    resumed = c.positions

    with open(args.out, "w") as f:
        json.dump(
            {
                "process": i,
                "num_processes": n,
                "global_devices": n_global,
                "positions": odo.positions.tolist(),
                "map_voxels": int(odo.voxmap.num_voxels()),
                "diverged": bool(odo.diverged),
                "resumed_positions": resumed.tolist(),
                "resumed_map_voxels": int(c.voxmap.num_voxels()),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
