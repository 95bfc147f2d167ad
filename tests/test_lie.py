"""Lie math vs closed forms and scipy.spatial.transform ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation, Slerp

from eskf_lio_tpu.ops import lie


def random_rotvecs(rng, n, max_angle=np.pi * 0.99):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def to_wxyz(q_xyzw):
    return np.roll(q_xyzw, 1, axis=-1)


def test_skew(rng):
    v = rng.normal(size=(5, 3)).astype(np.float32)
    K = np.asarray(lie.skew(jnp.asarray(v)))
    w = rng.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", K, w), np.cross(v, w), rtol=1e-5, atol=1e-6
    )


def test_so3_exp_matches_scipy(rng):
    r = random_rotvecs(rng, 64)
    R = np.asarray(lie.so3_exp(jnp.asarray(r)))
    R_ref = Rotation.from_rotvec(r).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_zero():
    R = np.asarray(lie.so3_exp(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_so3_log_roundtrip(rng):
    r = random_rotvecs(rng, 64)
    r_back = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(r))))
    np.testing.assert_allclose(r_back, r, atol=2e-4)


def test_quat_exp_matches_scipy(rng):
    r = random_rotvecs(rng, 64)
    q = np.asarray(lie.quat_exp(jnp.asarray(r)))
    q_ref = to_wxyz(Rotation.from_rotvec(r).as_quat())
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q_ref, atol=1e-5)


def test_quat_mul_matches_scipy(rng):
    r1, r2 = random_rotvecs(rng, 32), random_rotvecs(rng, 32)
    R1, R2 = Rotation.from_rotvec(r1), Rotation.from_rotvec(r2)
    q = np.asarray(
        lie.quat_mul(
            jnp.asarray(to_wxyz(R1.as_quat()).astype(np.float32)),
            jnp.asarray(to_wxyz(R2.as_quat()).astype(np.float32)),
        )
    )
    q_ref = to_wxyz((R1 * R2).as_quat())
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q_ref, atol=1e-5)


def test_quat_to_mat_and_back(rng):
    r = random_rotvecs(rng, 64)
    q = to_wxyz(Rotation.from_rotvec(r).as_quat()).astype(np.float32)
    R = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(R, Rotation.from_rotvec(r).as_matrix(), atol=1e-5)
    q_back = np.asarray(lie.quat_from_mat(jnp.asarray(R)))
    sign = np.sign(np.sum(q_back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back, sign * q, atol=1e-5)


def test_quat_from_mat_near_pi(rng):
    # Worst case for naive trace-based conversion.
    r = random_rotvecs(rng, 32)
    r = r / np.linalg.norm(r, axis=-1, keepdims=True) * (np.pi - 1e-4)
    R = Rotation.from_rotvec(r).as_matrix().astype(np.float32)
    q = np.asarray(lie.quat_from_mat(jnp.asarray(R)))
    R_back = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_quat_rotate(rng):
    r = random_rotvecs(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    q = to_wxyz(Rotation.from_rotvec(r).as_quat()).astype(np.float32)
    out = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, Rotation.from_rotvec(r).apply(v), atol=1e-5)


def test_quat_log_roundtrip(rng):
    r = random_rotvecs(rng, 64)
    back = np.asarray(lie.quat_log(lie.quat_exp(jnp.asarray(r))))
    np.testing.assert_allclose(back, r, atol=2e-4)


def test_quat_log_zero():
    np.testing.assert_allclose(
        np.asarray(lie.quat_log(lie.quat_identity())), np.zeros(3), atol=1e-7
    )


def test_slerp_matches_scipy(rng):
    r = random_rotvecs(rng, 2)
    R = Rotation.from_rotvec(r)
    q0 = to_wxyz(R[0].as_quat()).astype(np.float32)
    q1 = to_wxyz(R[1].as_quat()).astype(np.float32)
    s = Slerp([0.0, 1.0], R)
    for u in [0.0, 0.25, 0.5, 0.9, 1.0]:
        q = np.asarray(lie.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), u))
        q_ref = to_wxyz(s(u).as_quat())
        sign = np.sign(np.sum(q * q_ref))
        np.testing.assert_allclose(q, sign * q_ref, atol=1e-5)


def test_left_jacobian_closed_form(rng):
    # J_l(r) = ∫ exp(s·[r]×) ds — check against numerical integral.
    r = random_rotvecs(rng, 4)
    J = np.asarray(lie.left_jacobian(jnp.asarray(r)))
    s = np.linspace(0, 1, 2001)
    for i in range(4):
        mats = Rotation.from_rotvec(np.outer(s, r[i])).as_matrix()
        J_num = np.trapezoid(mats, s, axis=0)
        np.testing.assert_allclose(J[i], J_num, atol=1e-4)


def test_left_jacobian_small_angle():
    J = np.asarray(lie.left_jacobian(jnp.asarray([1e-9, 0.0, 0.0])))
    np.testing.assert_allclose(J, np.eye(3), atol=1e-6)


def test_se3_exp_roundtrip(rng):
    tau = rng.normal(size=(16, 6)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(tau))
    R, t = np.asarray(R), np.asarray(t)
    # rotation part matches scipy
    np.testing.assert_allclose(
        R, Rotation.from_rotvec(tau[:, 3:]).as_matrix(), atol=1e-5
    )
    # translation = J_l(phi) @ rho
    J = np.asarray(lie.left_jacobian(jnp.asarray(tau[:, 3:])))
    np.testing.assert_allclose(t, np.einsum("nij,nj->ni", J, tau[:, :3]), atol=1e-5)


def test_interpolate_pose_endpoints(rng):
    p0 = rng.normal(size=3).astype(np.float32)
    p1 = rng.normal(size=3).astype(np.float32)
    q0 = to_wxyz(Rotation.random(random_state=0).as_quat()).astype(np.float32)
    q1 = to_wxyz(Rotation.random(random_state=1).as_quat()).astype(np.float32)
    p, q = lie.interpolate_pose(
        jnp.asarray(p0), jnp.asarray(q0), jnp.asarray(0.0),
        jnp.asarray(p1), jnp.asarray(q1), jnp.asarray(1.0), jnp.asarray(0.0),
    )
    np.testing.assert_allclose(np.asarray(p), p0, atol=1e-5)
    sign = np.sign(np.sum(np.asarray(q) * q0))
    np.testing.assert_allclose(np.asarray(q), sign * q0, atol=1e-4)


def test_transform_points(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    R = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    out = np.asarray(lie.transform_points(jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)


def test_all_jittable(rng):
    """Every op must trace under jit without concretisation errors."""
    r = jnp.asarray(random_rotvecs(rng, 8))
    jax.jit(lie.so3_exp)(r)
    jax.jit(lie.quat_exp)(r)
    jax.jit(lambda r: lie.quat_log(lie.quat_exp(r)))(r)
    jax.jit(lambda r: lie.so3_log(lie.so3_exp(r)))(r)
    jax.jit(lie.left_jacobian)(r)
    jax.jit(lie.se3_exp)(jnp.concatenate([r, r], axis=-1))
