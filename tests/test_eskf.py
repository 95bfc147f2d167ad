"""ESKF vs an independent NumPy float64 oracle + analytic trajectories.

Covers BASELINE config 1 ("ESKF-only: IMU predict/update on a synthetic
trajectory, jit, no point clouds"): numerical parity of the f32 TPU-style
implementation against f64 closed-form propagation.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.types import FilterState, ImuChunk, Pose

CFG = Config()
NOISE = eskf.make_noise_params(CFG)


# ---------------------------------------------------------------------------
# float64 oracle (independent implementation of the Sola ESKF equations)
# ---------------------------------------------------------------------------


class Oracle:
    def __init__(self, cfg: Config):
        s = cfg.imu.noise_sigmas()
        self.qdiag = np.concatenate(
            [s["accel_noise"] ** 2, s["gyro_noise"] ** 2,
             s["accel_walk"] ** 2, s["gyro_walk"] ** 2]
        )
        self.V = np.diag(
            [cfg.translation_noise] * 3 + [cfg.rotation_noise] * 3
        )
        self.p = np.zeros(3)
        self.v = np.zeros(3)
        self.R = np.eye(3)
        self.ba = np.array(cfg.imu.bias_accel)
        self.bg = np.array(cfg.imu.bias_gyro)
        self.g = np.array(cfg.imu.gravity)
        self.P = cfg.init_P * np.eye(18)

    def predict(self, dt, gyro, accel):
        if dt < 0:
            return
        a = accel - self.ba
        w = gyro - self.bg
        Ra_g = self.R @ a + self.g
        dR = Rotation.from_rotvec(w * dt).as_matrix()

        F = np.eye(18)
        F[0:3, 3:6] = np.eye(3) * dt
        F[3:6, 6:9] = -self.R @ _skew(a) * dt
        F[3:6, 9:12] = -self.R * dt
        F[3:6, 15:18] = np.eye(3) * dt
        F[6:9, 6:9] = dR.T
        F[6:9, 12:15] = -np.eye(3) * dt

        self.p = self.p + self.v * dt + 0.5 * Ra_g * dt * dt
        self.v = self.v + Ra_g * dt
        self.R = self.R @ dR

        qs = self.qdiag * np.concatenate([np.full(6, dt * dt), np.full(6, dt)])
        noise = np.zeros(18)
        noise[3:15] = qs
        self.P = F @ self.P @ F.T + np.diag(noise)

    def update(self, R_obs, t_obs):
        residual = np.concatenate(
            [t_obs - self.p, Rotation.from_matrix(self.R.T @ R_obs).as_rotvec()]
        )
        H = np.zeros((6, 18))
        H[0:3, 0:3] = np.eye(3)
        H[3:6, 6:9] = np.eye(3)
        S = H @ self.P @ H.T + self.V
        K = self.P @ H.T @ np.linalg.inv(S)
        err = K @ residual
        self.P = (np.eye(18) - K @ H) @ self.P
        self.p += err[0:3]
        self.v += err[3:6]
        self.R = self.R @ Rotation.from_rotvec(err[6:9]).as_matrix()
        self.ba += err[9:12]
        self.bg += err[12:15]
        self.g += err[15:18]
        G = np.eye(18)
        G[6:9, 6:9] = np.eye(3) - 0.5 * _skew(err[6:9])
        self.P = G @ self.P @ G.T


def _skew(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
    )


def make_chunk(dts, gyros, accels, t_rels=None):
    m = len(dts)
    if t_rels is None:
        t_rels = np.cumsum(dts) - np.sum(dts)
    return ImuChunk(
        dt=jnp.asarray(dts, jnp.float32),
        t_rel=jnp.asarray(t_rels, jnp.float32),
        gyro=jnp.asarray(gyros, jnp.float32),
        accel=jnp.asarray(accels, jnp.float32),
        valid=jnp.ones(m, bool),
    )


# ---------------------------------------------------------------------------


def test_stationary_zero_input():
    """Self-consistent rest: a = −Rᵀg cancels gravity; state must not move."""
    cfg = Config(imu=CFG.imu.__class__(gravity=(0.0, 0.0, -9.81),
                                       bias_accel=(0, 0, 0), bias_gyro=(0, 0, 0)))
    noise = eskf.make_noise_params(cfg)
    s = eskf.init_state(cfg)
    m = 40
    accels = np.tile([0.0, 0.0, 9.81], (m, 1))
    chunk = make_chunk(np.full(m, 0.0025), np.zeros((m, 3)), accels)
    final, hist = eskf.predict_chunk(s, chunk, noise)
    np.testing.assert_allclose(np.asarray(final.p), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(final.v), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(final.q), [1, 0, 0, 0], atol=1e-6)
    # covariance grows on (v, θ, biases) but stays symmetric PSD
    P = np.asarray(final.P)
    np.testing.assert_allclose(P, P.T, atol=1e-8)
    assert np.all(np.linalg.eigvalsh(P) > 0)
    assert np.trace(P) > np.trace(np.asarray(s.P))


def test_predict_matches_oracle(rng):
    """60 s of random IMU: f32 scan-based prediction tracks the f64 oracle."""
    cfg = Config()
    noise = eskf.make_noise_params(cfg)
    s = eskf.init_state(cfg)
    oracle = Oracle(cfg)

    n_total, m = 1200, 40  # 3 s at 400 Hz, chunks of 40
    dts = np.full(n_total, 0.0025)
    gyros = 0.2 * rng.normal(size=(n_total, 3))
    accels = np.tile([0.0, 0.0, -9.7], (n_total, 1)) + 0.5 * rng.normal(
        size=(n_total, 3)
    )

    for i in range(n_total):
        oracle.predict(dts[i], gyros[i], accels[i])

    for k in range(0, n_total, m):
        chunk = make_chunk(dts[k:k + m], gyros[k:k + m], accels[k:k + m])
        s, _ = eskf.predict_chunk(s, chunk, noise)

    # positions drift ~metres over 3 s of integration; f32 should stay close
    np.testing.assert_allclose(np.asarray(s.p), oracle.p, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s.v), oracle.v, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(jnp.sum(s.q * s.q))), 1.0, atol=1e-5
    )
    R = Rotation.from_matrix(np.asarray(eskf.pose_of(s).R))
    R_err = (R.inv() * Rotation.from_matrix(oracle.R)).magnitude()
    assert R_err < 1e-4
    np.testing.assert_allclose(
        np.asarray(s.P), oracle.P, rtol=1e-2, atol=1e-6
    )


def test_circle_trajectory_analytic():
    """Constant-rate circular motion with exact IMU: position must match the
    analytic circle."""
    cfg = Config(imu=CFG.imu.__class__(gravity=(0.0, 0.0, -9.81)))
    noise = eskf.make_noise_params(cfg)
    radius, omega = 5.0, 0.5  # m, rad/s
    dt, n = 0.0025, 1600  # 4 s

    s = eskf.init_state(cfg)._replace(
        p=jnp.asarray([radius, 0.0, 0.0], jnp.float32),
        v=jnp.asarray([0.0, radius * omega, 0.0], jnp.float32),
    )
    # body x tangent? keep identity attitude rotating at ω about z:
    # a_world = -ω² r(t);  a_body = Rᵀ(a_world - g_world)
    ts = np.arange(1, n + 1) * dt
    gyros = np.tile([0, 0, omega], (n, 1))
    accels = np.zeros((n, 3))
    for i, t in enumerate(ts):
        # mid-step attitude approximation is not needed: use exact at sample
        # start (ZOH like the filter's Euler integration); tolerance covers it
        theta = omega * (t - dt)
        Rwb = Rotation.from_rotvec([0, 0, theta]).as_matrix()
        a_world = -(omega ** 2) * radius * np.array(
            [np.cos(theta), np.sin(theta), 0.0]
        )
        accels[i] = Rwb.T @ (a_world - np.array([0, 0, -9.81]))

    for k in range(0, n, 40):
        chunk = make_chunk(np.full(40, dt), gyros[k:k + 40], accels[k:k + 40])
        s, _ = eskf.predict_chunk(s, chunk, noise)

    theta_end = omega * n * dt
    p_expect = radius * np.array([np.cos(theta_end), np.sin(theta_end), 0.0])
    np.testing.assert_allclose(np.asarray(s.p), p_expect, atol=0.05)


def test_padding_is_noop(rng):
    s = eskf.init_state(CFG)
    m = 16
    gyros = rng.normal(size=(m, 3)).astype(np.float32)
    accels = rng.normal(size=(m, 3)).astype(np.float32)
    chunk_full = make_chunk(np.full(m, 0.0025), gyros, accels)
    # same data followed by invalid padding
    pad = 8
    chunk_padded = ImuChunk(
        dt=jnp.concatenate([chunk_full.dt, jnp.full(pad, 0.0025)]),
        t_rel=jnp.concatenate([chunk_full.t_rel, jnp.zeros(pad)]),
        gyro=jnp.concatenate([chunk_full.gyro, jnp.ones((pad, 3))]),
        accel=jnp.concatenate([chunk_full.accel, jnp.ones((pad, 3))]),
        valid=jnp.concatenate([chunk_full.valid, jnp.zeros(pad, bool)]),
    )
    f1, _ = eskf.predict_chunk(s, chunk_full, NOISE)
    f2, _ = eskf.predict_chunk(s, chunk_padded, NOISE)
    for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(f2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_negative_dt_dropped(rng):
    """ref `ErrorStateKF.cpp:80-82`: dt<0 samples are skipped."""
    s = eskf.init_state(CFG)
    gyros = rng.normal(size=(4, 3))
    accels = rng.normal(size=(4, 3))
    c1 = make_chunk([0.0025, 0.0025, 0.0025, 0.0025], gyros, accels)
    f_ref, _ = eskf.predict_chunk(s, c1, NOISE)
    # make sample 2 negative-dt; then sample 3 absorbs its dt
    g2 = np.vstack([gyros[:2], gyros[3:], gyros[3:]])
    a2 = np.vstack([accels[:2], accels[3:], accels[3:]])
    c2 = make_chunk([0.0025, 0.0025, -1.0, 0.0025], np.vstack([gyros[:2], gyros[2:3], gyros[3:]]), np.vstack([accels[:2], accels[2:3], accels[3:]]))
    f_neg, _ = eskf.predict_chunk(s, c2, NOISE)
    c3 = make_chunk([0.0025, 0.0025, 0.0025], np.vstack([gyros[:2], gyros[3:]]), np.vstack([accels[:2], accels[3:]]))
    f_skip, _ = eskf.predict_chunk(s, c3, NOISE)
    for a, b in zip(jax.tree.leaves(f_neg), jax.tree.leaves(f_skip)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    del f_ref, g2, a2


def test_update_matches_oracle(rng):
    # pin the reference YAML's tuning (`hilti_config.yaml:35-36`): this test
    # asserts observation-dominated behaviour, which needs V << P
    cfg = Config(translation_noise=1e-6, rotation_noise=1e-6)
    noise = eskf.make_noise_params(cfg)
    s = eskf.init_state(cfg)
    oracle = Oracle(cfg)

    # propagate a bit so P is non-trivial
    m = 80
    gyros = 0.3 * rng.normal(size=(m, 3))
    accels = np.tile([0, 0, -9.7], (m, 1)) + rng.normal(size=(m, 3))
    for i in range(m):
        oracle.predict(0.0025, gyros[i], accels[i])
    chunk = make_chunk(np.full(m, 0.0025), gyros, accels)
    s, _ = eskf.predict_chunk(s, chunk, noise)

    # observed pose = slightly perturbed current pose
    dp = np.array([0.02, -0.01, 0.03])
    dr = np.array([0.01, 0.02, -0.015])
    R_obs = oracle.R @ Rotation.from_rotvec(dr).as_matrix()
    t_obs = oracle.p + dp

    oracle.update(R_obs, t_obs)
    s2 = eskf.pose_update(
        s,
        Pose(jnp.asarray(R_obs, jnp.float32), jnp.asarray(t_obs, jnp.float32)),
        noise,
    )

    np.testing.assert_allclose(np.asarray(s2.p), oracle.p, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2.v), oracle.v, atol=1e-4)
    R2 = np.asarray(eskf.pose_of(s2).R)
    assert (Rotation.from_matrix(R2).inv() * Rotation.from_matrix(oracle.R)).magnitude() < 1e-4
    np.testing.assert_allclose(np.asarray(s2.P), oracle.P, rtol=5e-2, atol=1e-7)
    # noise is tiny (1e-6) vs P (~1e-3): the observation should dominate
    np.testing.assert_allclose(np.asarray(s2.p), t_obs, atol=1e-3)


def test_state_at_gather(rng):
    s = eskf.init_state(CFG)
    m = 8
    chunk = make_chunk(
        np.full(m, 0.0025),
        rng.normal(size=(m, 3)),
        rng.normal(size=(m, 3)),
    )
    final, hist, full = eskf.predict_chunk_full(s, chunk, NOISE)
    s0 = eskf.state_at(full, jnp.asarray(0))
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s_last = eskf.state_at(full, jnp.asarray(m))
    for a, b in zip(jax.tree.leaves(s_last), jax.tree.leaves(final)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_chunk_jit_once():
    """predict_chunk must be jittable and retraceable-free across calls."""
    s = eskf.init_state(CFG)
    f = jax.jit(lambda s, c: eskf.predict_chunk(s, c, NOISE))
    m = 8
    chunk = make_chunk(np.full(m, 0.0025), np.zeros((m, 3)), np.zeros((m, 3)))
    out1 = f(s, chunk)
    out2 = f(out1[0], chunk)
    assert out2[0].p.shape == (3,)
