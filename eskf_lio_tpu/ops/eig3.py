"""Closed-form symmetric 3x3 eigen-analysis, batched and branchless.

The reference regularises each per-point covariance to U·diag(1,1,1e-2)·Vᵀ via
Eigen::JacobiSVD (`CloudPreprocessor.cpp:121-123`).  For a symmetric PSD
matrix that equals  I − (1−ε)·n̂ n̂ᵀ  where n̂ is the eigenvector of the
*smallest* eigenvalue (the local plane normal) — so the TPU path only needs
that one eigenvector, which has a cheap closed form (trigonometric/Cardano
eigenvalues + cross-product eigenvector).  No iterative SVD, no batched LAPACK
— a handful of fused VPU elementwise ops.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def smallest_eigvec_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 3] unit eigenvector of the smallest
    eigenvalue.  For (near-)isotropic matrices the direction is ambiguous;
    returns ẑ there (matching Eigen JacobiSVD's U=I on identity input, which
    the reference hits for <3-neighbour points, `CloudPreprocessor.cpp:116`).
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    # trigonometric closed-form eigenvalues (Smith's algorithm)
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    # det(B)/2 with B = (A - q I) / p
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # λ_min = q + 2 p cos(φ + 2π/3)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector: null space of (A - λI) via row cross products
    r0 = jnp.stack([a00 - lam_min, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam_min, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam_min], axis=-1)
    c_a = jnp.cross(r0, r1)
    c_b = jnp.cross(r0, r2)
    c_c = jnp.cross(r1, r2)
    n_a = jnp.sum(c_a * c_a, axis=-1)
    n_b = jnp.sum(c_b * c_b, axis=-1)
    n_c = jnp.sum(c_c * c_c, axis=-1)

    best_ab = jnp.where((n_a >= n_b)[..., None], c_a, c_b)
    n_ab = jnp.maximum(n_a, n_b)
    best = jnp.where((n_ab >= n_c)[..., None], best_ab, c_c)
    n_best = jnp.maximum(n_ab, n_c)

    # degenerate (isotropic / repeated eigenvalue): fall back to ẑ
    degenerate = n_best < _EPS
    zhat = jnp.zeros_like(best).at[..., 2].set(1.0)
    vec = jnp.where(degenerate[..., None], zhat, best)
    return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)


def plane_regularize(A: jnp.ndarray, plane_factor: float) -> jnp.ndarray:
    """U·diag(1,1,ε)·Uᵀ regularisation (ref `CloudPreprocessor.cpp:121-123`):
    I − (1−ε)·n̂n̂ᵀ with n̂ the smallest-eigenvalue direction of A."""
    n = smallest_eigvec_sym3(A)
    outer = n[..., :, None] * n[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    return eye - (1.0 - plane_factor) * outer
