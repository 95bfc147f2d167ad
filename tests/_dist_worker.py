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

    odo = ShardedOdometry(worker_config(), n_devices=n_global)
    odo.run(make_seq(), max_scans=6)

    with open(args.out, "w") as f:
        json.dump(
            {
                "process": i,
                "num_processes": n,
                "global_devices": n_global,
                "positions": odo.positions.tolist(),
                "map_voxels": int(odo.voxmap.num_voxels()),
                "diverged": bool(odo.diverged),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
