"""Tuning experiment: measurement noise / IMU-noise variants -> ATE + iters.
Usage: python _tune_exp.py VARIANT"""
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline import replay
from eskf_lio_tpu.utils import metrics

variant = sys.argv[1]
tn, rn, noise = {
    "A": (1e-5, 1e-5, False),
    "B": (1e-4, 3e-5, True),
    "C": (1e-3, 3e-4, False),
    "D": (1e-4, 3e-5, False),  # current bench (baseline, cached)
    "E": (1e-5, 1e-5, True),
}[variant]

config = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=tn, rotation_noise=rn,
    max_raw_points=24576, max_scan_points=12288, max_imu_per_scan=64,
    hash_capacity_log2=19, scan_hash_capacity_log2=16, max_probe=32,
)
kw = {}
if noise:
    kw = dict(
        imu_noise_gyro=4.9e-3,      # rad/s per sample (datasheet @400Hz)
        imu_noise_accel=0.0206,     # m/s^2 per sample
        gyro_bias=np.array([0.002, -0.001, 0.0015]),
        accel_bias=np.array([0.02, -0.03, 0.01]),
    )
seq = dataset.make_synthetic_sequence(duration=13.0, points_per_scan=20000,
                                      seed=11, **kw)
positions, rotations, diags, voxmap = replay.run_replay(config, seq)
gt = np.asarray(seq.gt_positions)
n = min(len(positions), len(gt))
est, gtn = positions[:n], gt[:n]
R, t, _ = metrics.umeyama_alignment(est, gtn)
err = np.linalg.norm(est @ R.T + t - gtn, axis=1)
it = diags["icp_iterations"]
print(f"[{variant}] tn={tn} rn={rn} imu_noise={noise}")
print(f"[{variant}] ATE rmse {np.sqrt((err**2).mean())*100:.1f} cm  max {err.max()*100:.1f} cm")
print(f"[{variant}] err every 10 (cm): {np.round(err[::10]*100,1)}")
print(f"[{variant}] iters mean {it.mean():.1f}  hard-half mean {it[64:].mean():.1f}  max {it.max()}")
print(f"[{variant}] converged {diags['icp_converged'].mean():.2%}")
