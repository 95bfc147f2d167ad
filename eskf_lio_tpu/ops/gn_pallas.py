"""Fused Pallas TPU kernel for the VGICP Gauss-Newton normal equations.

The hottest loop of the reference is the per-pair JᵀWJ/JᵀWr accumulation
(`/root/reference/src/Registration.cpp:60-76,83-102`): for each
correspondence, Σ_w = R Σ_src Rᵀ, W = (Σ_w + Σ_voxel)⁻¹, J = [I | −[p]×],
r = p − μ, accumulate JᵀWJ ∈ ℝ⁶ˣ⁶ and JᵀWr ∈ ℝ⁶.

Why a kernel instead of XLA einsums (`models/registration.py
normal_equations`): the einsum path works on [N,3]/[N,3,3] arrays whose
trailing dims pad to the TPU's (8,128) register tile — 125 of 128 lanes are
wasted on every elementwise op, and the batched 3×3/3×6 matmuls are far
below MXU tile size.  This kernel streams ONE packed [19, N] operand
(struct-of-arrays: lanes = points) through VMEM in [S, 128] component
tiles, so every VPU op runs at full register utilisation; the whole chain —
covariance rotation, 3×3 symmetric inverse (adjugate), masking, block
products, 28-way reduction — happens in registers with no HBM
intermediates.  Measured on one v5e chip at N=32768 (tools/bench_gn.py):
see README "Pallas vs XLA" for the current numbers.

Exploits the block structure instead of forming J:
    JᵀWJ = [[ W     −W·S ],        JᵀWr = [  W·r  ]
            [ S·W   −S·W·S]]               [ S·W·r ]
with S = skew(p) (Sᵀ = −S).  All products are lane-wise polynomials in the
6 W entries and p/r components.

Layout: f32 operand X[19, N] (rows: p_world(3), Σ_src packed(6) in the
frame selected by R, μ(3), Σ_map packed(6), mask(1)) reshaped to
[19, N/128, 128] and blocked along the middle axis; R rides in a tiny
(1, 128) VMEM operand (first 9 lanes, row-major).  Grid steps accumulate
into a [32, 128] output whose first 28 rows hold per-lane partial sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

# rows of the packed operand
_ROWS = 19
_BLOCK = 16384  # points per grid step; 19*16384*4 B = 1.2 MiB in VMEM


def _gn_kernel(r_ref, x_ref, out_ref):
    """One grid step: accumulate the 28 GN sums over a [19, S, 128] block.

    Each component slice is an [S, 128] tile — S sublane rows of 128 lanes,
    so every VPU op runs at full register utilisation (a [1, B] layout
    would use 1 of 8 sublanes; [N, 3]/[N, 3, 3] layouts in the XLA path
    waste 125/128 lanes to padding — this layout is the entire reason the
    kernel exists)."""
    x = x_ref[:]  # [19, S, 128] f32
    row = lambda i: x[i]
    px, py, pz = row(0), row(1), row(2)
    s00, s01, s02, s11, s12, s22 = (row(3 + i) for i in range(6))
    mx, my, mz = row(9), row(10), row(11)
    q00, q01, q02, q11, q12, q22 = (row(12 + i) for i in range(6))
    mask = row(18)

    # Σ_w = R Σ_src Rᵀ with R row-major scalars (identity when the caller
    # already holds world-frame covariances).  Replaces the per-iteration
    # [N,3,3] rotation einsum of the XLA path (`Registration.cpp:11-13,27`
    # semantics: source covariances rotate with the accumulated transform).
    r0, r1, r2 = r_ref[0, 0], r_ref[0, 1], r_ref[0, 2]
    r3, r4, r5 = r_ref[0, 3], r_ref[0, 4], r_ref[0, 5]
    r6, r7, r8 = r_ref[0, 6], r_ref[0, 7], r_ref[0, 8]
    m00 = r0 * s00 + r1 * s01 + r2 * s02
    m01 = r0 * s01 + r1 * s11 + r2 * s12
    m02 = r0 * s02 + r1 * s12 + r2 * s22
    m10 = r3 * s00 + r4 * s01 + r5 * s02
    m11 = r3 * s01 + r4 * s11 + r5 * s12
    m12 = r3 * s02 + r4 * s12 + r5 * s22
    m20 = r6 * s00 + r7 * s01 + r8 * s02
    m21 = r6 * s01 + r7 * s11 + r8 * s12
    m22 = r6 * s02 + r7 * s12 + r8 * s22
    t00 = m00 * r0 + m01 * r1 + m02 * r2
    t01 = m00 * r3 + m01 * r4 + m02 * r5
    t02 = m00 * r6 + m01 * r7 + m02 * r8
    t11 = m10 * r3 + m11 * r4 + m12 * r5
    t12 = m10 * r6 + m11 * r7 + m12 * r8
    t22 = m20 * r6 + m21 * r7 + m22 * r8

    # A = Σ_w + Σ_map, lifted to identity where masked so the closed-form
    # inverse stays finite (the result is zeroed by the mask afterwards).
    inv_m = 1.0 - mask
    a00 = t00 + q00 + inv_m
    a01 = t01 + q01
    a02 = t02 + q02
    a11 = t11 + q11 + inv_m
    a12 = t12 + q12
    a22 = t22 + q22 + inv_m

    # W = A⁻¹ via adjugate/det (ref `Registration.cpp:95` per-pair inverse)
    co00 = a11 * a22 - a12 * a12
    co01 = a02 * a12 - a01 * a22
    co02 = a01 * a12 - a02 * a11
    det = a00 * co00 + a01 * co01 + a02 * co02
    idet = mask / det  # fold the mask into the inverse
    w00 = co00 * idet
    w01 = co01 * idet
    w02 = co02 * idet
    w11 = (a00 * a22 - a02 * a02) * idet
    w12 = (a01 * a02 - a00 * a12) * idet
    w22 = (a00 * a11 - a01 * a01) * idet

    rx = px - mx
    ry = py - my
    rz = pz - mz

    # v = W·r reused across the block products
    vx = w00 * rx + w01 * ry + w02 * rz
    vy = w01 * rx + w11 * ry + w12 * rz
    vz = w02 * rx + w12 * ry + w22 * rz

    # B = −W·S (S = skew(p)): (W·S)[i,0] = Wi1*pz − Wi2*py;
    # [i,1] = Wi2*px − Wi0*pz; [i,2] = Wi0*py − Wi1*px
    b00 = -(w01 * pz - w02 * py)
    b10 = -(w11 * pz - w12 * py)
    b20 = -(w12 * pz - w22 * py)
    b01 = -(w02 * px - w00 * pz)
    b11 = -(w12 * px - w01 * pz)
    b21 = -(w22 * px - w02 * pz)
    b02 = -(w00 * py - w01 * px)
    b12 = -(w01 * py - w11 * px)
    b22 = -(w02 * py - w12 * px)

    # D = SᵀWS = S·B (Sᵀ = −S): (S·B)[0,k] = −pz*B[1,k] + py*B[2,k], etc.
    d00 = -pz * b10 + py * b20
    d01 = -pz * b11 + py * b21
    d02 = -pz * b12 + py * b22
    d11 = pz * b01 - px * b21
    d12 = pz * b02 - px * b22
    d22 = -py * b02 + px * b12

    # JᵀWr bottom = S·W·r = skew(p)·v
    g3 = py * vz - pz * vy
    g4 = pz * vx - px * vz
    g5 = px * vy - py * vx

    comps = (
        # JᵀWJ upper triangle, row-major:
        # row0: W00 W01 W02 | B00 B01 B02
        w00, w01, w02, b00, b01, b02,
        # row1: W11 W12 | B10 B11 B12
        w11, w12, b10, b11, b12,
        # row2: W22 | B20 B21 B22
        w22, b20, b21, b22,
        # rows 3-5: D upper triangle
        d00, d01, d02, d11, d12, d22,
        # JᵀWr
        vx, vy, vz, g3, g4, g5,
        # correspondence count + 4 zero rows padding to the (32, ·) tile
        mask, mask, mask, mask, mask,
    )  # 32 × [S, 128]
    # reduce sublanes only — lanes are summed once by the caller
    partial = jnp.concatenate(
        [jnp.sum(c, axis=0, keepdims=True) for c in comps], axis=0
    )  # [32, 128]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + partial


_TRI = [
    (0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 1), (1, 2), (1, 3), (1, 4), (1, 5),
    (2, 2), (2, 3), (2, 4), (2, 5),
    (3, 3), (3, 4), (3, 5), (4, 4), (4, 5), (5, 5),
]


def _unpack_sums(sums: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[28] → (JTJ [6,6], JTr [6], num_corr f32)."""
    JTJ = jnp.zeros((6, 6), sums.dtype)
    for n, (i, j) in enumerate(_TRI):
        JTJ = JTJ.at[i, j].set(sums[n])
        if i != j:
            JTJ = JTJ.at[j, i].set(sums[n])
    JTr = sums[21:27]
    return JTJ, JTr, sums[27]


def pack_operand(
    pts_w: jnp.ndarray,
    covs_packed: jnp.ndarray,
    mu: jnp.ndarray,
    cov_map_packed: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble the [19, N] kernel operand (transposed struct-of-arrays).

    XLA fuses the upstream lookup selects into this transpose-concat, so
    the operand write is the only extra HBM traffic.
    """
    dtype = pts_w.dtype
    return jnp.concatenate(
        [
            pts_w.T,
            covs_packed.T,
            mu.T,
            cov_map_packed.T,
            mask.astype(dtype)[None, :],
        ],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def _gn_call(
    r_flat: jnp.ndarray, x: jnp.ndarray, *, interpret: bool, block: int
) -> jnp.ndarray:
    n = x.shape[1]
    grid = n // block
    s = block // 128  # sublane rows per component tile
    x3 = x.reshape(_ROWS, n // 128, 128)
    r_row = jnp.zeros((1, 128), x.dtype).at[0, :9].set(r_flat)
    out = pl.pallas_call(
        _gn_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_ROWS, s, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((32, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=300 * n, bytes_accessed=4 * _ROWS * n, transcendentals=0
        ),
    )(r_row, x3)
    return jnp.sum(out[:28, :], axis=1)


def _run(pts_w, covs_packed, R, mu, cov_map_packed, mask, interpret, block):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pts_w.shape[0]
    blk = min(block, ((n + 127) // 128) * 128)  # multiple of 128 lanes
    pad = (-n) % blk
    x = pack_operand(pts_w, covs_packed, mu, cov_map_packed, mask)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    r_flat = jnp.reshape(R, (9,)).astype(x.dtype)
    sums = _gn_call(r_flat, x, interpret=interpret, block=blk)
    JTJ, JTr, _ = _unpack_sums(sums)
    return JTJ, JTr


def normal_equations_pallas(
    pts_w: jnp.ndarray,
    covs_w: jnp.ndarray,
    mu_map: jnp.ndarray,
    cov_map: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    interpret: bool | None = None,
    block: int = _BLOCK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for `registration.normal_equations`
    (`/root/reference/src/Registration.cpp:60-76` semantics): [N,3,3]
    world-frame covariances, R = identity inside the kernel."""
    from eskf_lio_tpu.map.voxel_map import pack_cov

    return _run(
        pts_w, pack_cov(covs_w), jnp.eye(3, dtype=pts_w.dtype), mu_map,
        pack_cov(cov_map), mask, interpret, block,
    )


def normal_equations_pallas_rotated(
    pts_w: jnp.ndarray,
    covs_body_packed: jnp.ndarray,
    R: jnp.ndarray,
    mu_map: jnp.ndarray,
    cov_map_packed: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    interpret: bool | None = None,
    block: int = _BLOCK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused form for the GN loop: body-frame packed source
    covariances (loop-invariant) + the accumulated rotation R — the kernel
    applies Σ_w = R Σ Rᵀ per point, so the align body carries no [N,3,3]
    intermediates at all.

    Returns (JTJ [6,6], JTr [6]); masked rows contribute exactly zero.
    """
    return _run(
        pts_w, covs_body_packed, R, mu_map, cov_map_packed, mask,
        interpret, block,
    )
