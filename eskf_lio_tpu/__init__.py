"""ESKF-LIO-TPU: a TPU-native LiDAR-inertial odometry framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
ESKF_LIO system (error-state Kalman filter + voxel-hash local map + VGICP
registration).  The entire odometry hot path is a single jittable function
over a pytree of fixed-shape device arrays; multi-chip scaling partitions the
voxel map across a `jax.sharding.Mesh` and reduces the tiny Gauss-Newton
normal equations with collectives.

Layers (bottom-up):
  ops/       branchless Lie-group math, voxel hashing, deskew, downsample,
             covariance estimation, Pallas kernels
  map/       device-resident open-addressing voxel hash map
  models/    error-state Kalman filter, VGICP Gauss-Newton registration
  parallel/  mesh construction + shard_map'd sharded-map registration
  pipeline/  the odometry orchestrator (host IO boundary + jitted step)
  io/        dataset readers/writers, synthetic world generator
  utils/     profiling, checkpointing, metrics (ATE), logging
  viz/       offline map/trajectory visualisation
"""

__version__ = "0.1.0"

from eskf_lio_tpu.config import Config, load_config

__all__ = ["Config", "load_config", "__version__"]
