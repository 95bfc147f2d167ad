"""VGICP registration tests (BASELINE config 2): GN convergence to a known
perturbation against a fixed voxel map."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import registration as reg
from eskf_lio_tpu.types import Pose, ProcessedScan

CFG = Config(max_scan_points=4096)
CAP = 1 << 16


def make_world(rng, n=6000):
    """Points on three orthogonal planes (floor + 2 walls): full 6-DoF
    constraint."""
    n3 = n // 3
    floor = np.column_stack(
        [rng.uniform(-8, 8, n3), rng.uniform(-8, 8, n3), np.zeros(n3)]
    )
    wall1 = np.column_stack(
        [rng.uniform(-8, 8, n3), np.full(n3, -8.0), rng.uniform(0, 4, n3)]
    )
    wall2 = np.column_stack(
        [np.full(n3, 8.0), rng.uniform(-8, 8, n3), rng.uniform(0, 4, n3)]
    )
    normals = np.vstack(
        [
            np.tile([0, 0, 1.0], (n3, 1)),
            np.tile([0, 1.0, 0], (n3, 1)),
            np.tile([1.0, 0, 0], (n3, 1)),
        ]
    )
    pts = np.vstack([floor, wall1, wall2]).astype(np.float32)
    covs = np.stack(
        [np.eye(3) - 0.99 * np.outer(nv, nv) for nv in normals]
    ).astype(np.float32)
    return pts, covs


def build_map(pts, covs):
    m = vm.VoxelMap.create(CAP)
    m, dropped = vm.insert(
        m,
        jnp.asarray(pts),
        vm.pack_cov(jnp.asarray(covs)),
        jnp.ones(len(pts), bool),
        voxel_size=CFG.map_voxel_size,
        max_points_per_voxel=CFG.max_points_per_voxel,
    )
    assert int(dropped) == 0
    return m


def make_scan(pts, covs, T_inv_R, T_inv_t, k=4096):
    """Scan = world points taken into the body frame by the inverse pose."""
    sel = np.arange(0, len(pts), max(1, len(pts) // k))[:k]
    body = (pts[sel] - T_inv_t) @ T_inv_R  # R^T (p - t): inverse transform
    n = len(body)
    pad = k - n
    return ProcessedScan(
        points=jnp.asarray(
            np.vstack([body, np.zeros((pad, 3))]).astype(np.float32)
        ),
        covs=jnp.asarray(
            np.vstack([covs[sel], np.tile(np.eye(3), (pad, 1, 1))]).astype(
                np.float32
            )
        ),
        valid=jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
    )


def test_align_identity(rng):
    """Perfectly aligned scan: converges immediately, pose unchanged."""
    pts, covs = make_world(rng)
    m = build_map(pts, covs)
    scan = make_scan(pts, covs, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    res = reg.align(scan, m, Pose.identity(), CFG)
    assert bool(res.converged)
    assert int(res.iterations) <= 2
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.pose.R), np.eye(3), atol=1e-3)


def test_align_recovers_perturbation(rng):
    """Small SE(3) offset: GN must recover it within the ICP thresholds."""
    pts, covs = make_world(rng)
    m = build_map(pts, covs)
    R_true = Rotation.from_rotvec([0.02, -0.03, 0.04]).as_matrix().astype(np.float32)
    t_true = np.array([0.15, -0.1, 0.08], np.float32)
    scan = make_scan(pts, covs, R_true, t_true)
    res = reg.align(scan, m, Pose.identity(), CFG)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.pose.t), t_true, atol=0.02)
    rot_err = Rotation.from_matrix(
        np.asarray(res.pose.R) @ R_true.T
    ).magnitude()
    assert rot_err < 0.01
    assert int(res.num_correspondences) > 1000


def test_align_with_good_guess(rng):
    """Starting from the true pose, stays there in few iterations."""
    pts, covs = make_world(rng)
    m = build_map(pts, covs)
    R_true = Rotation.from_rotvec([0.05, 0.02, -0.03]).as_matrix().astype(np.float32)
    t_true = np.array([0.3, 0.2, -0.1], np.float32)
    scan = make_scan(pts, covs, R_true, t_true)
    guess = Pose(jnp.asarray(R_true), jnp.asarray(t_true))
    res = reg.align(scan, m, guess, CFG)
    assert bool(res.converged)
    assert int(res.iterations) <= 3
    np.testing.assert_allclose(np.asarray(res.pose.t), t_true, atol=5e-3)


def test_align_no_correspondences(rng):
    """Scan far outside the map: identity increment, no NaNs."""
    pts, covs = make_world(rng)
    m = build_map(pts, covs)
    scan = make_scan(pts + 500.0, covs, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    res = reg.align(scan, m, Pose.identity(), CFG)
    assert int(res.num_correspondences) == 0
    assert np.all(np.isfinite(np.asarray(res.pose.t)))
    assert np.all(np.isfinite(np.asarray(res.pose.R)))
    # identity increments -> immediate "convergence" by thresholds
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0, atol=1e-6)


def test_inv3x3_sym(rng):
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(3)
    inv = np.asarray(reg.inv3x3_sym(jnp.asarray(A)))
    np.testing.assert_allclose(
        inv @ A, np.tile(np.eye(3), (32, 1, 1)), atol=2e-3
    )


def test_align_jittable(rng):
    pts, covs = make_world(rng, n=3000)
    m = build_map(pts, covs)
    scan = make_scan(pts, covs, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    f = jax.jit(lambda s, m, g: reg.align(s, m, g, CFG))
    res = f(scan, m, Pose.identity())
    assert bool(res.converged)
