"""Replay the bench workload on CPU; report per-scan ICP correction norm and
ATE vs ground truth.  Working tool for tuning rounds.

Usage:
    python tools/ate_check.py                   # framework default noises
    python tools/ate_check.py --ref-noise       # reference YAML noises (1e-6)
    python tools/ate_check.py --tn 1e-4 --rn 3e-5
"""
import argparse
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import numpy as np

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline import replay


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tn", type=float, default=1e-4, help="translation noise")
    ap.add_argument("--rn", type=float, default=3e-5, help="rotation noise")
    ap.add_argument(
        "--ref-noise", action="store_true",
        help="use the reference YAML update noises (1e-6/1e-6)",
    )
    ap.add_argument("--duration", type=float, default=13.0)
    args = ap.parse_args()
    tn, rn = (1e-6, 1e-6) if args.ref_noise else (args.tn, args.rn)

    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=tn, rotation_noise=rn,
        max_raw_points=24576, max_scan_points=12288, max_imu_per_scan=64,
        hash_capacity_log2=19,
    )
    seq = dataset.make_synthetic_sequence(
        duration=args.duration, points_per_scan=20000, seed=11
    )
    positions, rotations, diags, voxmap = replay.run_replay(config, seq)
    gt = seq.gt_positions
    n = min(len(positions), len(gt))
    err = np.linalg.norm(positions[:n] - gt[:n], axis=1)
    print(
        f"ATE rmse: {np.sqrt((err ** 2).mean()) * 100:.2f} cm  "
        f"max: {err.max() * 100:.2f} cm",
        flush=True,
    )
    print("per-scan |error| cm, scans 95..115:", np.round(err[95:115] * 100, 1))
    print("iters 95..115:", diags["icp_iterations"][95:115])
    t = np.asarray(seq.gt_times)
    v_gt = np.gradient(gt, t, axis=0)
    print(
        "gt speed at scans 20/60/100:",
        [round(float(np.linalg.norm(v_gt[i])), 2) for i in (20, 60, 100)],
    )


if __name__ == "__main__":
    main()
