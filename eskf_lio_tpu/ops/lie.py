"""Branchless, small-angle-safe SO(3)/SE(3) operations.

TPU-native counterpart of the reference's `Utils.cpp` (skew `Utils.cpp:5-11`,
rotation-vector exp/log `Utils.cpp:22-38`, SE(3) exp with left Jacobian
`Utils.cpp:40-63`, pose interpolation `Utils.cpp:65-75`).  Differences by
design:

* Everything is batched (leading dims broadcast) and fully branchless —
  `jnp.where` with safe denominators instead of the reference's `if angle <
  1e-6` guard (which it only applies in `computeJ`; its `rotationVectorTo*`
  helpers divide by a possibly-zero norm, `Utils.cpp:28-38` — a latent NaN we
  do not replicate).
* Quaternions are stored [w, x, y, z] (scalar first) as float arrays; all ops
  are closed-form polynomial/trig expressions the VPU fuses into a handful of
  elementwise kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

# Taylor-switch threshold: below this angle (rad) use series expansions.
_EPS = 1e-6


def _safe(x: jnp.ndarray, small) -> jnp.ndarray:
    """Replace near-zero values by 1 so divisions never produce inf/nan.
    Results at those lanes are overwritten by the Taylor branch."""
    return jnp.where(small, jnp.ones_like(x), x)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix (ref `Utils.cpp:5-11`)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# sinc-family coefficients with Taylor fallbacks
# ---------------------------------------------------------------------------


def _sinc(theta: jnp.ndarray) -> jnp.ndarray:
    """sin(θ)/θ, Taylor 1 - θ²/6 for small θ."""
    small = jnp.abs(theta) < _EPS
    t = _safe(theta, small)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(t) / t)


def _cosc(theta: jnp.ndarray) -> jnp.ndarray:
    """(1-cos θ)/θ², Taylor 1/2 - θ²/24 for small θ."""
    small = jnp.abs(theta) < _EPS
    t = _safe(theta, small)
    return jnp.where(small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(t)) / (t * t))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def _skew_sq(r: jnp.ndarray) -> jnp.ndarray:
    """[r]ײ = r·rᵀ − (rᵀr)·I, closed form — avoids a 3×3 matmul (which the
    TPU MXU would run in bf16 by default)."""
    outer = r[..., :, None] * r[..., None, :]
    nsq = jnp.sum(r * r, axis=-1)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), outer.shape)
    return outer - nsq * eye


def so3_exp(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Replaces ref `rotationVectorToMatrix` (`Utils.cpp:28-32`) with a
    zero-angle-safe form: R = I + sinc(θ)·[r]× + cosc(θ)·[r]×²."""
    theta = jnp.linalg.norm(r, axis=-1)
    K = skew(r)
    K2 = _skew_sq(r)
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> rotation vector [..., 3].

    Replaces ref `rotationMatrixToVector` (`Utils.cpp:22-26`).  Uses the
    quaternion route (numerically stable near 0 and π)."""
    return quat_log(quat_from_mat(R))


# ---------------------------------------------------------------------------
# Quaternions, [w, x, y, z]
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ p, batched."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_exp(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector [..., 3] -> unit quaternion [..., 4].

    Replaces ref `rotationVectorToQuaternion` (`Utils.cpp:34-38`) without the
    zero-norm division: q = [cos(θ/2), sinc(θ/2)/... · r/ ... ] via
    sin(θ/2)/θ · r."""
    theta = jnp.linalg.norm(r, axis=-1)
    half = 0.5 * theta
    w = jnp.cos(half)
    # sin(θ/2)/θ = 0.5·sinc(θ/2)
    s = 0.5 * _sinc(half)
    return jnp.concatenate([w[..., None], s[..., None] * r], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] -> rotation vector [..., 3] in (-π, π]."""
    # Force w >= 0 for the short arc.
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0).astype(q.dtype)
    q = q * sign
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vnorm = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    # r = θ · v/|v| ;  θ/|v| = θ / sin(θ/2) -> 2/ w-ish for small θ
    small = vnorm < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), theta / _safe(vnorm, small))
    return scale[..., None] * q[..., 1:]


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4], branchless.

    Uses the 4-candidate formulation (computes all four quaternion component
    magnitudes from the diagonal, picks signs from the off-diagonals, selects
    the candidate built from the largest component) — stable for every
    rotation, no data-dependent Python control flow."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four squared magnitudes (each >= 0 analytically; clamp for safety).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate quaternions (unnormalised), one per dominant component.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors [..., 3] by unit quaternions [..., 4]."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, u) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (short arc),
    branchless with lerp fallback for nearly-parallel inputs.

    Used by SE(3) interpolation (ref `Utils.cpp:65-75` uses Eigen slerp)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0))
    small = theta < _EPS
    sin_theta = _safe(jnp.sin(theta), small)
    u = jnp.asarray(u, dtype=q0.dtype)
    if u.ndim < theta.ndim:
        u = u[..., None]
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / sin_theta)
    w1 = jnp.where(small, u, jnp.sin(u * theta) / sin_theta)
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def left_jacobian(r: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(r), [..., 3] -> [..., 3, 3].

    Matches ref `computeJ` (`Utils.cpp:40-54`):
    J = sinc(θ)·I + (1-sinc(θ))·aaᵀ + cosc(θ)·θ·[a]× rewritten branchlessly as
    J = I + cosc(θ)·[r]× + (θ-sin θ)/θ³·[r]×²."""
    theta = jnp.linalg.norm(r, axis=-1)
    small = jnp.abs(theta) < _EPS
    t = _safe(theta, small)
    c1 = _cosc(theta)  # (1-cosθ)/θ²
    c2 = jnp.where(
        small, 1.0 / 6.0 - theta * theta / 120.0, (t - jnp.sin(t)) / (t * t * t)
    )
    K = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + c1[..., None, None] * K + c2[..., None, None] * _skew_sq(r)


def se3_exp(tau: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """se(3) twist [..., 6] (ρ first, φ last — ref layout `Utils.cpp:56-63`)
    -> (R [..., 3, 3], t [..., 3]) with t = J_l(φ)·ρ."""
    rho, phi = tau[..., :3], tau[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum(
        "...ij,...j->...i", left_jacobian(phi), rho, precision="highest"
    )
    return R, t


def interpolate_pose(
    p0: jnp.ndarray,
    q0: jnp.ndarray,
    t0: jnp.ndarray,
    p1: jnp.ndarray,
    q1: jnp.ndarray,
    t1: jnp.ndarray,
    t: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose interpolation at time t: slerp attitude + lerp position.

    Matches ref `interpolateSE3` (`Utils.cpp:65-75`) including its +1e-6
    denominator regulariser."""
    u = (t - t0) / (t1 - t0 + 1e-6)
    return p0 + u[..., None] * (p1 - p0), quat_slerp(q0, q1, u)


def transform_points(
    R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray
) -> jnp.ndarray:
    """Apply rigid transform to [..., N, 3] points (ref `Utils.cpp:13-20`).

    Full-f32 contraction: point coordinates reach ~100 m, so the TPU's
    default bf16 matmul (~3 decimal digits) would cost centimetres."""
    return (
        jnp.einsum("...ni,...ji->...nj", pts, R, precision="highest")
        + t[..., None, :]
    )
