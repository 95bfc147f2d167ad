"""Voxelized GICP registration, TPU-native.

Re-designs the reference `ICP` (`/root/reference/src/Registration.cpp`):
iterated Gauss-Newton alignment of a covariance-annotated scan against the
voxel map's per-voxel Gaussians.

Reference semantics preserved:
* correspondence = the point's own voxel only (`LocalMap.cpp:88-109`);
* weight W = (Σ_src_world + Σ_voxel)⁻¹, J = [I | −[p]×], solve
  JᵀWJ · ξ = −JᵀWr with r = p_src_world − μ_voxel
  (`Registration.cpp:83-102`), left-compose se3-exp of ξ
  (`Registration.cpp:19-20`, `Utils.cpp:56-63`);
* source covariances rotate with the accumulated transform (Open3D
  `PointCloud::Transform` rotates covariances; `Registration.cpp:11-13,27`);
* convergence: cos θ = ½(tr R_Δ − 1) ≥ cosine_threshold and
  ‖t_Δ‖² ≤ translation_sq_threshold (`Registration.cpp:37-50`), bounded by
  max_iteration (`hilti_config.yaml:51`).

TPU re-design: the whole GN iteration is one `lax.while_loop` body — hash
lookup (gather), closed-form batched 3×3 inverse, and the JᵀWJ/JᵀWr
reduction as einsum contractions (MXU) instead of the reference's
OpenMP-reduction loop (`Registration.cpp:60-76`).  When the map is sharded,
the same body runs under shard_map with each device reducing its owned
correspondences and a psum of the 6×6/6×1 normal equations
(see `parallel/sharded_map.py`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.ops import lie
from eskf_lio_tpu.types import Pose, ProcessedScan

_HI = jax.lax.Precision.HIGHEST


class AlignResult(NamedTuple):
    pose: Pose
    iterations: jnp.ndarray  # int32
    converged: jnp.ndarray  # bool
    num_correspondences: jnp.ndarray  # int32 (last iteration)


def inv3x3_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form inverse of symmetric 3×3 matrices (adjugate/det).
    Replaces per-pair `covariance.inverse()` (`Registration.cpp:95`)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    i00 = co_a * inv_det
    i01 = co_b * inv_det
    i02 = co_c * inv_det
    i11 = (a * f - c * c) * inv_det
    i12 = (b * c - a * e) * inv_det
    i22 = (a * d - b * b) * inv_det
    return jnp.stack(
        [
            jnp.stack([i00, i01, i02], -1),
            jnp.stack([i01, i11, i12], -1),
            jnp.stack([i02, i12, i22], -1),
        ],
        axis=-2,
    )


def normal_equations(
    pts_w: jnp.ndarray,
    covs_w: jnp.ndarray,
    mu_map: jnp.ndarray,
    cov_map: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate JᵀWJ [6,6] and JᵀWr [6] over masked correspondences
    (the two hot loops of `Registration.cpp:60-76,83-102`).

    J_i = [I | −[p_i]×] (3×6); W_i = (Σ_src_w + Σ_map)⁻¹; r_i = p_i − μ_i.
    """
    dtype = pts_w.dtype
    W = inv3x3_sym(covs_w + cov_map)
    W = W * mask[:, None, None].astype(dtype)

    n = pts_w.shape[0]
    S = lie.skew(pts_w)  # [N,3,3]
    J = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3)), -S], axis=-1
    )  # [N, 3, 6]
    r = pts_w - mu_map  # [N, 3]

    WJ = jnp.einsum("nij,njk->nik", W, J, precision=_HI)  # [N,3,6]
    JTJ = jnp.einsum("nia,nib->ab", J, WJ, precision=_HI)  # [6,6]
    JTr = jnp.einsum("nia,nij,nj->a", J, W, r, precision=_HI)  # [6]
    return JTJ, JTr


def solve_increment(
    JTJ: jnp.ndarray, JTr: jnp.ndarray, num_corr: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve JᵀWJ ξ = −JᵀWr (`Registration.cpp:78`).  Returns (R_Δ, t_Δ).
    Degenerate systems (<6 correspondences) yield the identity update."""
    dtype = JTJ.dtype
    ok = num_corr >= 6
    # tiny Tikhonov floor keeps the Cholesky/solve finite when degenerate;
    # the result is discarded via `ok` in that case
    JTJ_safe = JTJ + (1e-3 * (1.0 - ok.astype(dtype)) + 1e-8) * jnp.eye(
        6, dtype=dtype
    )
    xi = jnp.linalg.solve(JTJ_safe, -JTr)
    xi = jnp.where(ok, xi, jnp.zeros_like(xi))
    R_delta, t_delta = lie.se3_exp(xi)
    return R_delta, t_delta


def converged_check(
    R_delta: jnp.ndarray, t_delta: jnp.ndarray, config: Config
) -> jnp.ndarray:
    """ref `convergenceCheck` (`Registration.cpp:37-50`)."""
    cosine = 0.5 * (jnp.trace(R_delta) - 1.0)
    t_sq = jnp.sum(t_delta * t_delta)
    return jnp.logical_and(
        cosine >= config.icp_cosine_threshold,
        t_sq <= config.icp_translation_sq_threshold,
    )


def align(
    scan: ProcessedScan,
    voxmap: vm.VoxelMap | None,
    guess: Pose,
    config: Config,
    lookup_fn: Callable | None = None,
    reduce_fn: Callable | None = None,
) -> AlignResult:
    """Iterated GN alignment (`ICP::align`, `Registration.cpp:7-35`).

    `lookup_fn(points_world) -> (mu [N,3], cov_packed [N,6], hit [N])`
    defaults to the local single-device merged-view lookup; the sharded
    path passes a closure probing only the caller's map shard (hit=False
    off-shard).

    `reduce_fn(JTJ, JTr, num_corr) -> (JTJ, JTr, num_corr)` is identity by
    default; under shard_map the sharded path passes a psum over the mesh
    axis, turning per-device partial normal equations into the global ones —
    the Schur-trick that keeps per-point work local and ships only 6×6+6
    floats over ICI per GN iteration.
    """
    if lookup_fn is None:
        # one payload-inlined bucket row-gather per tier
        # (`map/voxel_map.py` module docstring)
        def lookup_fn(pts):
            return vm.lookup(
                voxmap,
                pts,
                voxel_size=config.map_voxel_size,
                max_points_per_voxel=config.max_points_per_voxel,
            )

    if reduce_fn is None:
        def reduce_fn(JTJ, JTr, num_corr):
            return JTJ, JTr, num_corr

    backend = config.gn_backend
    if backend == "auto":
        # measured head-to-head (tools/bench_gn.py, README "Pallas vs
        # XLA"): the fused kernel wins on TPU; einsum elsewhere (the
        # kernel would run interpreted off-TPU)
        backend = "pallas" if jax.default_backend() == "tpu" else "einsum"
    if backend not in ("einsum", "pallas"):
        raise ValueError(
            f"gn_backend must be 'auto', 'einsum' or 'pallas', got "
            f"{config.gn_backend!r}"
        )

    covs = scan.covs
    covs_packed = vm.pack_cov(covs)  # loop-invariant (body frame)
    n = scan.points.shape[0]
    relook = max(int(config.icp_relookup_every), 1)
    # adaptive lazy re-association (see config.icp_rematch_threshold):
    # re-match while the PREVIOUS GN increment could still have moved a
    # point across a voxel border, then freeze the correspondences.
    # Dominates the blind every-k schedule (freezes the tail, not the
    # large early steps) but STILL trades ATE — any freeze makes the
    # convergence check fire early on stale matches (measured: 1.81 ->
    # 2.14 cm at delta=1 cm on the heavy bench) — so the shipped default
    # is 0 (off, reference parity); the knob serves throughput-first
    # deployments.  Measurements: tools/probe_adaptive.py, BASELINE.md.
    delta = float(config.icp_rematch_threshold)
    adaptive = delta > 0.0
    carry_corr = adaptive or relook > 1

    def body(carry):
        R_tot, t_tot, it = carry[0], carry[1], carry[2]
        corr = carry[5] if carry_corr else None
        disp_prev = carry[6] if adaptive else None
        pts_w = lie.transform_points(R_tot, t_tot, scan.points)
        if not carry_corr:
            # reference parity: re-match every iteration
            # (`Registration.cpp:16`)
            mu, cov_map_packed, hit = lookup_fn(pts_w)
        else:
            need = (
                disp_prev > delta if adaptive else it % relook == 0
            )
            # the predicate is built from the psum-reduced global
            # increment, so it is uniform across shards — the cond
            # branches identically under shard_map
            mu, cov_map_packed, hit = jax.lax.cond(
                need,
                lambda p: lookup_fn(p),
                lambda p: corr,
                pts_w,
            )
        mask = jnp.logical_and(scan.valid, hit)
        num_corr = jnp.sum(mask.astype(jnp.int32))

        if backend == "pallas":
            from eskf_lio_tpu.ops import gn_pallas

            # the kernel applies the world-frame rotation Σ_w = R Σ Rᵀ
            # internally — no [N,3,3] intermediate in the loop body
            JTJ, JTr = gn_pallas.normal_equations_pallas_rotated(
                pts_w, covs_packed, R_tot, mu, cov_map_packed, mask
            )
        else:
            # rotate source covariances into world frame: R Σ Rᵀ
            covs_w = jnp.einsum(
                "ab,nbc,dc->nad", R_tot, covs, R_tot, precision=_HI
            )
            JTJ, JTr = normal_equations(
                pts_w, covs_w, mu, vm.unpack_cov(cov_map_packed), mask
            )
        JTJ, JTr, num_corr = reduce_fn(JTJ, JTr, num_corr)
        R_d, t_d = solve_increment(JTJ, JTr, num_corr)

        # left-compose (`Registration.cpp:19`)
        R_new = jnp.einsum("ij,jk->ik", R_d, R_tot, precision=_HI)
        t_new = jnp.einsum("ij,j->i", R_d, t_tot, precision=_HI) + t_d
        conv = converged_check(R_d, t_d, config)
        out = (R_new, t_new, it + 1, conv, num_corr)
        if carry_corr:
            # thread the correspondences only when lazy re-association is
            # on — the extra [N,10] while-carry is not free
            out = out + ((mu, cov_map_packed, hit),)
        if adaptive:
            # max displacement this increment can have caused any scan
            # point: rotate about the scan centroid c, so the bound stays
            # tight far from the world origin —
            # |(R-I)p + t| <= theta*|p-c| + |(R-I)c + t|
            w = mask.astype(pts_w.dtype)
            n_valid = jnp.maximum(jnp.sum(w), 1.0)
            c = jnp.sum(pts_w * w[:, None], axis=0) / n_valid
            r_c = jnp.sqrt(
                jnp.max(
                    jnp.sum((pts_w - c) ** 2, axis=-1) * w,
                )
            )
            cos_t = jnp.clip(0.5 * (jnp.trace(R_d) - 1.0), -1.0, 1.0)
            theta = jnp.arccos(cos_t)
            drift = (R_d - jnp.eye(3, dtype=pts_w.dtype)) @ c + t_d
            disp = theta * r_c + jnp.linalg.norm(drift)
            out = out + (disp,)
        return out

    def cond(carry):
        return jnp.logical_and(
            carry[2] < config.icp_max_iterations, ~carry[3]
        )

    dtype = scan.points.dtype
    init = (
        guess.R,
        guess.t,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    if carry_corr:
        init = init + (
            (
                jnp.zeros((n, 3), dtype),
                jnp.zeros((n, 6), dtype),
                jnp.zeros((n,), bool),
            ),
        )
    if adaptive:
        # +inf forces a re-match on the first iteration
        init = init + (jnp.asarray(jnp.inf, dtype),)
    final = jax.lax.while_loop(cond, body, init)
    R_tot, t_tot, it, conv, num_corr = final[:5]
    return AlignResult(
        pose=Pose(R_tot, t_tot),
        iterations=it,
        converged=conv,
        num_correspondences=num_corr,
    )
