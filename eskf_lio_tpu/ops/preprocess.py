"""Scan preprocessing: extrinsics, deskew, voxel downsample, covariance.

TPU-native re-design of the reference `CloudPreprocessor`
(`/root/reference/src/CloudPreprocessor.cpp`):

* extrinsic LiDAR→IMU transform (`CloudPreprocessor.cpp:16`);
* motion-compensation deskew (`:25-74`) — the reference walks states and
  transforms contiguous point blocks; here each point selects the composed
  transform of its bracketing state (identical block semantics) via a
  one-hot [N, M+1] @ [M+1, 12] MXU contraction — the pose table is tiny, so
  a matmul runs at full throughput where a random gather would serialise on
  HBM latency;
* voxel downsample keeping the first point per voxel in scan order
  (`:85-99`) — one stable variadic sort + segment heads;
* per-point covariance + plane regularisation (`:103-124`) — the reference
  runs KD-tree KNN(30) + SVD; a KD-tree is pointer-chasing and TPU-hostile,
  so the neighbourhood is the 27-voxel grid patch around each kept point
  (≈0.45 m radius at 0.3 m voxels).  The 3×3×3 aggregation is SEPARABLE:
  in a key-sorted table the ±1 minor-axis neighbours are *adjacent rows*,
  so each axis is one shift-and-add pass, and switching the minor axis is
  one cheap variadic re-sort (axis-rotated key packing).  Three passes +
  three sorts replace any hash/probe/join machinery, with zero random
  access.  Moments are accumulated about each voxel's own centre
  (parallel-axis shifted between cells), which keeps every f32 covariance
  term O(voxel_size²) — strictly better conditioned than accumulating raw
  world coordinates.  Output role preserved: a plane-regularised
  Σ = U·diag(1,1,ε)·Uᵀ per kept point (ε = 1e-2,
  `CloudPreprocessor.hpp:30-31`), identity when the neighbourhood has <3
  points (`CloudPreprocessor.cpp:113-116`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.ops import eig3, segscan, voxel as vx
from eskf_lio_tpu.ops import sortmerge as sm
from eskf_lio_tpu.types import Pose, ProcessedScan, Scan, StateHistory
from eskf_lio_tpu.ops import lie

_BITS = 10
_MASK = (1 << _BITS) - 1


def deskew(
    points: jnp.ndarray,
    t_rel: jnp.ndarray,
    valid: jnp.ndarray,
    hist: StateHistory,
) -> jnp.ndarray:
    """Motion-compensate points to the scan-end frame
    (ref `CloudPreprocessor::deskew`, `CloudPreprocessor.cpp:25-74`).

    Each point takes the pose of the first state with state time > point
    time (the reference's block mapping), composed with the inverse of the
    pose interpolated at scan end (t_rel = 0).  All times are relative to
    scan end; `hist.t_rel[0]` is -inf (the pre-chunk state).
    """
    ts = jnp.where(hist.valid, hist.t_rel, jnp.inf)

    # bracketing states around scan end for the end pose
    idx_b = jnp.clip(
        jnp.searchsorted(ts, 0.0, side="right") - 1, 0, ts.shape[0] - 1
    )
    idx_a = jnp.clip(idx_b + 1, 0, ts.shape[0] - 1)
    # if no state beyond scan end exists, fall back to the last valid state
    last_valid = jnp.sum(hist.valid.astype(jnp.int32)) - 1
    idx_a = jnp.minimum(idx_a, last_valid)
    p_end, q_end = lie.interpolate_pose(
        hist.p[idx_b], hist.q[idx_b], ts[idx_b],
        hist.p[idx_a], hist.q[idx_a], ts[idx_a],
        jnp.asarray(0.0, points.dtype),
    )
    T_end_inv = Pose(lie.quat_to_mat(q_end), p_end).inverse()

    # per-state composed transform T_end⁻¹ ∘ T_state  (tiny: [M+1] poses)
    R_states = lie.quat_to_mat(hist.q)
    R_c = jnp.einsum("ij,njk->nik", T_end_inv.R, R_states, precision="highest")
    t_c = (
        jnp.einsum("ij,nj->ni", T_end_inv.R, hist.p, precision="highest")
        + T_end_inv.t
    )

    # per-point state index: first state with t_state > t_point.  The state
    # table is tiny, so rank-by-comparison (a [N, M+1] VPU reduction) beats
    # a log-round binary search of gathers.
    idx = jnp.sum(
        (t_rel[:, None] >= ts[None, :]).astype(jnp.int32), axis=1
    )
    idx = jnp.clip(idx, 1, last_valid)

    # Per-point pose fetch as a one-hot matmul instead of a [N,3,4] random
    # gather: [N, M+1] @ [M+1, 12] runs on the MXU at full throughput.
    m1 = R_c.shape[0]
    table = jnp.concatenate(
        [R_c.reshape(m1, 9), t_c], axis=1
    )  # [M+1, 12]
    onehot = jax.nn.one_hot(idx, m1, dtype=points.dtype)  # [N, M+1]
    Rt = jnp.einsum(
        "nm,mk->nk", onehot, table, precision="highest"
    )  # [N, 12]
    R_pt = Rt[:, :9].reshape(-1, 3, 3)
    t_pt = Rt[:, 9:]
    out = (
        jnp.einsum("nij,nj->ni", R_pt, points, precision="highest") + t_pt
    )
    return jnp.where(valid[:, None], out, points)


def _shift_moments(m: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Parallel-axis shift of packed moments [..., 10] = (m0, m1[3], m2[6])
    accumulated about centre c to moments about centre c - d (i.e. the
    source cell sits at offset +d from the target's centre):
    m1' = m1 + m0·d;  m2'_ab = m2_ab + d_a m1_b + d_b m1_a + m0 d_a d_b."""
    m0 = m[..., 0:1]
    m1 = m[..., 1:4]
    m2 = m[..., 4:10]
    m1s = m1 + m0 * d
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    x, y, z = m1[..., 0], m1[..., 1], m1[..., 2]
    m0s = m0[..., 0]
    m2s = jnp.stack(
        [
            m2[..., 0] + 2 * dx * x + m0s * dx * dx,
            m2[..., 1] + dx * y + dy * x + m0s * dx * dy,
            m2[..., 2] + dx * z + dz * x + m0s * dx * dz,
            m2[..., 3] + 2 * dy * y + m0s * dy * dy,
            m2[..., 4] + dy * z + dz * y + m0s * dy * dz,
            m2[..., 5] + 2 * dz * z + m0s * dz * dz,
        ],
        axis=-1,
    )
    return jnp.concatenate([m0, m1s, m2s], axis=-1)


def _axis_pass(
    rkey: jnp.ndarray, m: jnp.ndarray, d_axis: jnp.ndarray
) -> jnp.ndarray:
    """One separable neighbourhood pass: rows sorted by `rkey` (minor axis
    in the low _BITS bits, INT32_MAX dead tail); sums each row's moments
    with its ±1 minor-axis neighbours, which are adjacent rows when
    present.  `d_axis` [3] is +voxel_size along the pass axis."""
    live = rkey != sm.INT32_MAX
    minor = rkey & _MASK

    nxt_key = jnp.concatenate([rkey[1:], jnp.full((1,), sm.INT32_MAX, rkey.dtype)])
    nxt_live = jnp.concatenate([live[1:], jnp.zeros((1,), bool)])
    prv_key = jnp.concatenate([jnp.full((1,), sm.INT32_MAX, rkey.dtype), rkey[:-1]])
    prv_live = jnp.concatenate([jnp.zeros((1,), bool), live[:-1]])

    plus_ok = (
        live & nxt_live & (nxt_key == rkey + 1) & (minor != _MASK)
    )
    minus_ok = (
        live & prv_live & (prv_key == rkey - 1) & (minor != 0)
    )

    m_nxt = jnp.concatenate([m[1:], jnp.zeros((1, m.shape[1]), m.dtype)])
    m_prv = jnp.concatenate([jnp.zeros((1, m.shape[1]), m.dtype), m[:-1]])
    out = (
        m
        + jnp.where(plus_ok[:, None], _shift_moments(m_nxt, d_axis), 0.0)
        + jnp.where(minus_ok[:, None], _shift_moments(m_prv, -d_axis), 0.0)
    )
    return jnp.where(live[:, None], out, 0.0)


def _rotate_key(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Re-pack a (x,y,z) packed key so `axis` occupies the minor bits:
    axis=2 -> x|y|z (identity), axis=1 -> x|z|y, axis=0 -> y|z|x.
    Dead keys (INT32_MAX) stay INT32_MAX."""
    x = (packed >> (2 * _BITS)) & _MASK
    y = (packed >> _BITS) & _MASK
    z = packed & _MASK
    if axis == 2:
        r = packed
    elif axis == 1:
        r = (x << (2 * _BITS)) | (z << _BITS) | y
    else:
        r = (y << (2 * _BITS)) | (z << _BITS) | x
    return jnp.where(packed == sm.INT32_MAX, sm.INT32_MAX, r)


def downsample_and_covariances(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    config: Config,
) -> ProcessedScan:
    """First-point-per-voxel downsample + neighbourhood covariance
    (ref `voxelDownsampleAndEstimateCovariances`,
    `CloudPreprocessor.cpp:76-127`), padded/compacted to
    `config.max_scan_points`.

    One stable variadic sort groups the scan by packed voxel key (stability
    = the reference's first-in-scan-order keep rule for free); per-voxel
    voxel-centred moments come from segment sums; the 27-voxel
    neighbourhood is aggregated by three separable adjacent-row passes
    (see module docstring).  No hash tables, no probe loops, no joins.
    """
    n = points.shape[0]
    k_out = config.max_scan_points
    vs = config.downsample_voxel_size
    dtype = points.dtype

    keys = vx.voxel_key(points, vs)
    # static packing origin: scan points live in the scan-end body frame,
    # bounded by LiDAR range << the ±512-voxel packing span
    origin = jnp.full((3,), -512, jnp.int32)
    packed, in_range = sm.pack_keys(keys, origin)
    ok = jnp.logical_and(valid, in_range)

    # voxel-centred coordinates (f32-friendly moments)
    centers = (keys.astype(dtype) + 0.5) * vs
    q = jnp.where(ok[:, None], points - centers, 0.0)

    # every sort in this pipeline is a 2-operand (key, iota) sort with the
    # payload riding on ONE row gather: lax.sort costs ~10 s of XLA compile
    # PER OPERAND on this backend (tools/bench_compile.py), so the old
    # 12-15-operand variadic sorts were a cold-compile bomb; gathers compile
    # free and cost ~0.3 ms per 32k rows warm.
    packed_m = jnp.where(ok, packed, sm.INT32_MAX)
    packed_s, _, q_s = sm.sort_perm(packed_m, q)
    ok_s = packed_s != sm.INT32_MAX
    qx_s, qy_s, qz_s = q_s[:, 0], q_s[:, 1], q_s[:, 2]

    same = jnp.concatenate(
        [jnp.zeros((1,), bool), packed_s[1:] == packed_s[:-1]]
    )
    head = jnp.logical_and(ok_s, ~same)
    w = ok_s.astype(dtype)
    raw = jnp.concatenate(
        [
            w[:, None],
            q_s * w[:, None],
            jnp.stack(
                [
                    qx_s * qx_s, qx_s * qy_s, qx_s * qz_s,
                    qy_s * qy_s, qy_s * qz_s, qz_s * qz_s,
                ],
                axis=-1,
            )
            * w[:, None],
        ],
        axis=1,
    )  # [N, 10] per-point moments about the voxel centre
    # per-voxel moments land on each segment's HEAD row via the streaming
    # segmented suffix-scan (ops/segscan.py) — the random scatter-add of
    # segment_sum cost 2.3 ms at [131k,10] on chip, the scan ~60 µs
    table_m = segscan.segsum_sorted(packed_s, raw)

    # compact segment heads to the front; each head is (stable sort) the
    # FIRST point of its voxel in scan order — exactly
    # `CloudPreprocessor.cpp:87-99` semantics
    kcap = min(n, k_out)
    if k_out < n:
        # overflow possible: order heads by a multiplicative hash of the
        # voxel key, so a scan with more distinct voxels than the budget
        # drops a pseudo-random spatial subset rather than everything past
        # an ascending-key corner of the scan (the worst truncation for
        # registration geometry).  Head keys are unique, so the hash order
        # is deterministic.
        h = (packed_s * jnp.int32(-1640531527)) & jnp.int32(0x7FFFFFFF)
        h = jnp.where(h == sm.INT32_MAX, 0, h)
        hkey = jnp.where(head, h, sm.INT32_MAX)
    else:
        # no voxel can overflow a budget >= n: keep ascending packed order
        # and skip the restore re-sort below
        pos = jnp.arange(n, dtype=jnp.int32)
        hkey = jnp.where(head, pos, sm.INT32_MAX)
    qm = jnp.concatenate([q_s, table_m], axis=1)  # [N, 13] ride-along rows
    # slice the voxel table to the output budget before the neighbourhood
    # passes (take= slices the permutation BEFORE the gathers: N -> kcap
    # rows).  Dropped voxels neither survive downsampling nor contribute
    # to their neighbours' moments — the documented overflow path.
    h_sorted, _, hp_sorted, qm_sorted = sm.sort_perm(
        hkey, packed_s, qm, take=kcap
    )
    t_live = h_sorted != sm.INT32_MAX
    t_packed = jnp.where(t_live, hp_sorted, sm.INT32_MAX)
    t_q = qm_sorted[:, :3]
    t_m = jnp.where(t_live[:, None], qm_sorted[:, 3:13], 0.0)
    if k_out < n:
        # restore ascending packed order (the separable passes and the
        # map-merge path both require it)
        t_packed, _, t_qm = sm.sort_perm(
            t_packed, jnp.concatenate([t_q, t_m], axis=1)
        )
        t_live = t_packed != sm.INT32_MAX
        t_q = t_qm[:, :3]
        t_m = t_qm[:, 3:13]

    # ---- separable 3x3x3 neighbourhood aggregation ------------------------
    # z-pass in natural (x|y|z) order, then re-sort so y / x become the
    # minor axis; finish back in natural order (the output layout).
    ez = jnp.asarray([0.0, 0.0, vs], dtype)
    ey = jnp.asarray([0.0, vs, 0.0], dtype)
    ex = jnp.asarray([vs, 0.0, 0.0], dtype)

    m_z = _axis_pass(t_packed, t_m, ez)

    # the rotated keys are bijective repacks of t_packed, so one key
    # operand suffices (equal rkey <=> equal voxel; dead rows stay
    # INT32_MAX) and the partner packed key rides on the gather
    ky = _rotate_key(t_packed, 1)
    ky_s, _, packed_y, m_zs = sm.sort_perm(ky, t_packed, m_z)
    m_y = _axis_pass(ky_s, m_zs, ey)

    kx = _rotate_key(packed_y, 0)
    kx_s, _, packed_x, m_ys = sm.sort_perm(kx, packed_y, m_y)
    m_x = _axis_pass(kx_s, m_ys, ex)

    # back to ascending packed (= head-compacted) order
    _, _, nb = sm.sort_perm(packed_x, m_x)  # [N, 10] 27-nbhd moments

    # rows 0..K-1 of `nb` correspond 1:1 to rows of (t_packed, t_q): both
    # are the live voxels in ascending packed order (keys unique)
    sel = slice(0, kcap)
    out_valid = t_live[sel]
    out_packed = t_packed[sel]
    out_keys = sm.unpack_keys(out_packed, origin)
    out_centers = (out_keys.astype(dtype) + 0.5) * vs
    out_points = jnp.where(
        out_valid[:, None], out_centers + t_q[sel], 0.0
    )

    cnt = nb[sel, 0]
    denom = jnp.maximum(cnt, 1.0)
    mu_c = nb[sel, 1:4] / denom[:, None]  # about the voxel centre
    exx = nb[sel, 4] / denom - mu_c[:, 0] * mu_c[:, 0]
    exy = nb[sel, 5] / denom - mu_c[:, 0] * mu_c[:, 1]
    exz = nb[sel, 6] / denom - mu_c[:, 0] * mu_c[:, 2]
    eyy = nb[sel, 7] / denom - mu_c[:, 1] * mu_c[:, 1]
    eyz = nb[sel, 8] / denom - mu_c[:, 1] * mu_c[:, 2]
    ezz = nb[sel, 9] / denom - mu_c[:, 2] * mu_c[:, 2]
    cov = jnp.stack(
        [
            jnp.stack([exx, exy, exz], -1),
            jnp.stack([exy, eyy, eyz], -1),
            jnp.stack([exz, eyz, ezz], -1),
        ],
        axis=-2,
    )  # [K, 3, 3]

    cov_reg = eig3.plane_regularize(cov, config.covariance_plane_factor)

    # <3 neighbours: the reference would regularise its identity fallback to
    # diag(1,1,1e-2) (`CloudPreprocessor.cpp:113-116,121-123`) — but its
    # unbounded KNN(30) makes that case unreachable, whereas a bounded grid
    # neighbourhood hits it for isolated points.  A low-variance normal on a
    # point with no plane evidence gives garbage 50x-weight residuals, so
    # degenerate points stay fully isotropic here instead.
    few = cnt < config.min_neighbors_for_covariance
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), cov.shape)
    cov_reg = jnp.where(few[:, None, None], eye, cov_reg)

    # pad to the static output budget when the raw cloud was smaller
    k_eff = out_points.shape[0]
    if k_eff < k_out:
        pad = k_out - k_eff
        out_points = jnp.concatenate(
            [out_points, jnp.zeros((pad, 3), dtype)]
        )
        cov_reg = jnp.concatenate(
            [cov_reg, jnp.broadcast_to(jnp.eye(3, dtype=dtype), (pad, 3, 3))]
        )
        out_valid = jnp.concatenate([out_valid, jnp.zeros((pad,), bool)])
    return ProcessedScan(points=out_points, covs=cov_reg, valid=out_valid)


def preprocess(
    scan: Scan,
    hist: StateHistory,
    T_il: Pose,
    config: Config,
) -> ProcessedScan:
    """Full preprocessing pipeline (ref `CloudPreprocessor::process`,
    `CloudPreprocessor.cpp:10-23`): extrinsics → deskew → downsample +
    covariances.  Everything jit-safe with static shapes."""
    pts_imu = T_il.apply(scan.points)
    pts_desk = deskew(pts_imu, scan.t_rel, scan.valid, hist)
    return downsample_and_covariances(pts_desk, scan.valid, config)
