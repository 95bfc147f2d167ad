"""Fused Pallas GN kernel vs the einsum path (interpret mode on CPU).

The kernel must reproduce `registration.normal_equations`
(`/root/reference/src/Registration.cpp:60-102` semantics) bit-closely:
same JᵀWJ/JᵀWr, exact zero contribution from masked rows, any N (padding).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eskf_lio_tpu.map.voxel_map import pack_cov
from eskf_lio_tpu.models import registration as reg
from eskf_lio_tpu.ops import gn_pallas


def _rand_spd(rng, n, scale=0.3):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32) * scale
    return A @ A.transpose(0, 2, 1) + 0.05 * np.eye(3, dtype=np.float32)


def _inputs(n, seed=0, hit_rate=0.7):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    covs = _rand_spd(rng, n)
    covm = _rand_spd(rng, n)
    mu = pts + rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    mask = rng.random(n) < hit_rate
    return tuple(
        jnp.asarray(a) for a in (pts, covs, mu, covm, mask)
    )


@pytest.mark.parametrize("n", [128, 1000, 4096])
def test_matches_einsum(n):
    pts, covs, mu, covm, mask = _inputs(n, seed=n)
    J1, r1 = reg.normal_equations(pts, covs, mu, covm, mask)
    J2, r2 = gn_pallas.normal_equations_pallas(
        pts, covs, mu, covm, mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(J2), np.asarray(J1),
        rtol=1e-5, atol=1e-4 * float(jnp.max(jnp.abs(J1))),
    )
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(r1),
        rtol=1e-5, atol=1e-4 * float(jnp.max(jnp.abs(r1))),
    )


def test_masked_rows_contribute_zero():
    """Garbage (even non-finite-inverse) rows behind mask=False must not
    leak — the kernel lifts masked A to identity before inverting."""
    pts, covs, mu, covm, mask = _inputs(512, seed=3)
    covs_bad = covs.at[~mask].set(0.0)  # singular where masked
    covm_bad = covm.at[~mask].set(0.0)
    J2, r2 = gn_pallas.normal_equations_pallas(
        pts, covs_bad, mu, covm_bad, mask, interpret=True
    )
    J1, r1 = gn_pallas.normal_equations_pallas(
        pts, covs, mu, covm, mask, interpret=True
    )
    assert np.isfinite(np.asarray(J2)).all()
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=1e-5)


def test_rotated_variant_matches_einsum():
    """The in-kernel Σ_w = R Σ Rᵀ must equal rotating outside + einsum."""
    from eskf_lio_tpu.ops import lie

    pts, covs, mu, covm, mask = _inputs(777, seed=9)
    R, _ = lie.se3_exp(
        jnp.asarray([0.3, -0.2, 0.5, 0.0, 0.0, 0.0], jnp.float32)
    )
    covs_w = jnp.einsum("ab,nbc,dc->nad", R, covs, R)
    J1, r1 = reg.normal_equations(pts, covs_w, mu, covm, mask)
    J2, r2 = gn_pallas.normal_equations_pallas_rotated(
        pts, pack_cov(covs), R, mu, pack_cov(covm), mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(J2), np.asarray(J1),
        rtol=1e-5, atol=1e-4 * float(jnp.max(jnp.abs(J1))),
    )
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(r1),
        rtol=1e-5, atol=1e-4 * float(jnp.max(jnp.abs(r1))),
    )


def test_align_with_pallas_backend_matches(synthetic_scan_and_map=None):
    """Full align() with gn_backend=pallas converges to the einsum result."""
    import dataclasses

    from eskf_lio_tpu.config import Config
    from eskf_lio_tpu.map import voxel_map as vm
    from eskf_lio_tpu.ops import preprocess
    from eskf_lio_tpu.types import Pose, ProcessedScan

    rng = np.random.default_rng(42)
    n = 2048
    pts = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    covs = _rand_spd(rng, n, scale=0.05)
    config = Config(
        max_scan_points=n, hash_capacity_log2=14, map_delta_log2=11,
        icp_max_iterations=30,
    )
    voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
    voxmap, _ = vm.insert(
        voxmap, jnp.asarray(pts), pack_cov(jnp.asarray(covs)),
        jnp.ones(n, bool), voxel_size=config.map_voxel_size,
        max_points_per_voxel=config.max_points_per_voxel,
    )
    # perturbed scan
    from eskf_lio_tpu.ops import lie
    xi = jnp.asarray([0.02, -0.03, 0.01, 0.004, -0.002, 0.003], jnp.float32)
    R_true, t_true = lie.se3_exp(xi)
    scan = ProcessedScan(
        points=lie.transform_points(R_true.T, -R_true.T @ t_true, jnp.asarray(pts)),
        covs=jnp.asarray(covs),
        valid=jnp.ones(n, bool),
    )
    guess = Pose(jnp.eye(3), jnp.zeros(3))
    # pin the reference side to einsum: on a TPU host "auto" would also
    # resolve to pallas and the comparison would be vacuous
    res_e = reg.align(
        scan, voxmap, guess,
        dataclasses.replace(config, gn_backend="einsum"),
    )
    res_p = reg.align(
        scan, voxmap, guess,
        dataclasses.replace(config, gn_backend="pallas"),
    )
    np.testing.assert_allclose(
        np.asarray(res_p.pose.t), np.asarray(res_e.pose.t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_p.pose.R), np.asarray(res_e.pose.R), atol=1e-4
    )
