"""Core pytree types.

The reference keeps state in heap objects (`State` with Eigen members,
`Types.hpp:31-52`; deques of shared_ptrs).  Here every piece of odometry
state is a NamedTuple of fixed-shape arrays — a pytree that lives in device
memory, moves through jit/scan/shard_map unchanged, and checkpoints as a
flat list of arrays.

Time convention: device code only ever sees *relative* times (f32 seconds
relative to the current scan's end).  Absolute f64 timestamps stay on the
host — f32 cannot represent epoch seconds to sub-millisecond precision.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FilterState(NamedTuple):
    """18-DoF error-state KF nominal state + covariance
    (ref `Types.hpp:31-52`).  Error-state ordering matches the reference:
    [δp 0:3, δv 3:6, δθ 6:9, δb_a 9:12, δb_g 12:15, δg 15:18]."""

    p: jnp.ndarray  # [3] position (world)
    v: jnp.ndarray  # [3] velocity (world)
    q: jnp.ndarray  # [4] attitude quaternion, wxyz, body->world
    ba: jnp.ndarray  # [3] accelerometer bias
    bg: jnp.ndarray  # [3] gyroscope bias
    g: jnp.ndarray  # [3] gravity (world)
    P: jnp.ndarray  # [18, 18] error covariance


class ImuChunk(NamedTuple):
    """A fixed-capacity batch of IMU samples driving one scan interval.
    Padded to `max_imu_per_scan`; `valid` masks real samples."""

    dt: jnp.ndarray  # [M] seconds since previous sample (>= 0)
    t_rel: jnp.ndarray  # [M] sample time relative to scan end (s)
    gyro: jnp.ndarray  # [M, 3] rad/s
    accel: jnp.ndarray  # [M, 3] m/s^2
    valid: jnp.ndarray  # [M] bool


class StateHistory(NamedTuple):
    """Pose trajectory produced by predicting through an ImuChunk — the
    device analogue of the reference's `std::deque<State>` used for deskew
    (`CloudPreprocessor.cpp:25-74`).  Index 0 is the pre-chunk state;
    index i+1 is the state after sample i."""

    t_rel: jnp.ndarray  # [M+1] time relative to scan end
    p: jnp.ndarray  # [M+1, 3]
    q: jnp.ndarray  # [M+1, 4]
    valid: jnp.ndarray  # [M+1] bool (entry 0 always valid)


class Scan(NamedTuple):
    """A fixed-capacity raw LiDAR scan in sensor frame, padded to
    `max_raw_points` (ref `LidarMeasurement`, `Types.hpp:22-28`)."""

    points: jnp.ndarray  # [N, 3]
    t_rel: jnp.ndarray  # [N] point time relative to scan end (<= 0)
    valid: jnp.ndarray  # [N] bool


class ProcessedScan(NamedTuple):
    """Deskewed + downsampled scan with per-point covariances, padded to
    `max_scan_points` (output role of `CloudPreprocessor::process`,
    `CloudPreprocessor.cpp:10-23`)."""

    points: jnp.ndarray  # [K, 3] (IMU/body frame at scan end)
    covs: jnp.ndarray  # [K, 3, 3] regularised plane covariances
    valid: jnp.ndarray  # [K] bool


class Pose(NamedTuple):
    """Rigid transform as rotation matrix + translation."""

    R: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3]

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other (apply `other` first)."""
        R = jnp.einsum("ij,jk->ik", self.R, other.R, precision="highest")
        t = (
            jnp.einsum("ij,j->i", self.R, other.t, precision="highest")
            + self.t
        )
        return Pose(R, t)

    def inverse(self) -> "Pose":
        Rt = self.R.T
        return Pose(Rt, -jnp.einsum("ij,j->i", Rt, self.t, precision="highest"))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return (
            jnp.einsum("...i,ji->...j", pts, self.R, precision="highest")
            + self.t
        )
