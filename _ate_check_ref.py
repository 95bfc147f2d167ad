"""Replay the bench workload on CPU; report per-scan ICP correction norm and
ATE vs ground truth. Working tool."""
import os
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp
from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

config = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-6, rotation_noise=1e-6,
    max_raw_points=24576, max_scan_points=12288, max_imu_per_scan=64,
    hash_capacity_log2=19, scan_hash_capacity_log2=16, max_probe=32,
)
seq = dataset.make_synthetic_sequence(duration=13.0, points_per_scan=20000, seed=11)
positions, rotations, diags, voxmap = replay.run_replay(config, seq)
gt = seq.gt_positions
n = min(len(positions), len(gt))
err = np.linalg.norm(positions[:n] - gt[:n], axis=1)
print(f"ATE rmse: {np.sqrt((err**2).mean())*100:.2f} cm  max: {err.max()*100:.2f} cm", flush=True)
print("per-scan |error| cm, scans 95..115:", np.round(err[95:115]*100, 1), flush=True)
it = diags["icp_iterations"]
print("iters 95..115:", it[95:115], flush=True)
# velocity estimate proxy: gt velocities
t = np.asarray(seq.gt_times)
v_gt = np.gradient(gt, t, axis=0)
print("gt speed at scans 20/60/100:", [round(float(np.linalg.norm(v_gt[i])),2) for i in (20,60,100)], flush=True)
