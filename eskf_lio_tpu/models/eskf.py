"""Error-state Kalman filter, TPU-native.

Re-designs the reference `ErrorStateKF` (`/root/reference/src/
ErrorStateKF.cpp`) as pure functions over the `FilterState` pytree:

* `predict_chunk` — a `lax.scan` over a fixed-capacity `ImuChunk`, replacing
  the one-sample-at-a-time `process()` calls of the reference main loop
  (`Odometry.cpp:28-34`, `ErrorStateKF.cpp:76-113`).  Invalid/padded samples
  carry the state through unchanged (the reference drops dt<0 samples,
  `ErrorStateKF.cpp:80-82`).
* `pose_update` — the 6-DoF measurement update (`ErrorStateKF.cpp:115-162`):
  residual vs the ICP pose, Kalman gain, error injection
  (`ErrorStateKF.cpp:164-172`) and covariance reset (`:174-180`).

The reference's rollback + IMU replay (`ErrorStateKF.cpp:120-122,147-155`)
disappears by construction: each scan-step predicts through exactly the
samples with t <= scan end, applies the update to that state, and the *next*
chunk re-propagates any overhang samples from the corrected state — the same
trajectory, with no mutable deques.

All covariance algebra is f32 with `precision="highest"` — the default TPU
bf16 matmul loses ~3 decimal digits, fatal for an 18×18 covariance at 1e-3
scale.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.ops import lie
from eskf_lio_tpu.types import FilterState, ImuChunk, Pose, StateHistory

_HI = jax.lax.Precision.HIGHEST


class NoiseParams(NamedTuple):
    """Process / measurement noise (ref `ErrorStateKF.cpp:25-58`)."""

    q_diag: jnp.ndarray  # [12] diag of Q_i before dt scaling:
    # [σ²_an(3), σ²_gn(3), σ²_aw(3), σ²_gw(3)]
    v_diag: jnp.ndarray  # [6] measurement noise diag (trans, rot)


def make_noise_params(config: Config, dtype=jnp.float32) -> NoiseParams:
    s = config.imu.noise_sigmas()
    q = jnp.concatenate(
        [
            jnp.asarray(s["accel_noise"] ** 2),
            jnp.asarray(s["gyro_noise"] ** 2),
            jnp.asarray(s["accel_walk"] ** 2),
            jnp.asarray(s["gyro_walk"] ** 2),
        ]
    ).astype(dtype)
    v = jnp.concatenate(
        [
            jnp.full(3, config.translation_noise),
            jnp.full(3, config.rotation_noise),
        ]
    ).astype(dtype)
    return NoiseParams(q_diag=q, v_diag=v)


def init_state(config: Config, dtype=jnp.float32) -> FilterState:
    """Initial state: biases/gravity from config, P = init_P·I
    (ref `ErrorStateKF.cpp:19-23`, `Types.hpp:40`)."""
    return FilterState(
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        q=lie.quat_identity(dtype),
        ba=jnp.asarray(config.imu.bias_accel, dtype),
        bg=jnp.asarray(config.imu.bias_gyro, dtype),
        g=jnp.asarray(config.imu.gravity, dtype),
        P=config.init_P * jnp.eye(18, dtype=dtype),
    )


def predict_step(
    state: FilterState,
    dt: jnp.ndarray,
    gyro: jnp.ndarray,
    accel: jnp.ndarray,
    q_diag: jnp.ndarray,
    valid: jnp.ndarray,
) -> FilterState:
    """One IMU propagation step (ref `ErrorStateKF.cpp:76-113`).

    Nominal:  p += v·dt + ½(R·a + g)·dt²;  v += (R·a + g)·dt;
              q ← q ⊗ Exp(ω·dt).
    Covariance: P ← F_x P F_xᵀ + F_i Q_i F_iᵀ with the reference's exact F_x
    blocks; Q_i's accel/gyro-noise blocks scale by dt², bias-walk blocks by
    dt (`ErrorStateKF.cpp:98-109`).
    """
    dtype = state.p.dtype
    dt = dt.astype(dtype)
    R = lie.quat_to_mat(state.q)
    a = accel - state.ba
    w = gyro - state.bg
    Ra_g = jnp.einsum("ij,j->i", R, a, precision=_HI) + state.g

    dtheta = w * dt
    dq = lie.quat_exp(dtheta)

    p_new = state.p + state.v * dt + 0.5 * Ra_g * dt * dt
    v_new = state.v + Ra_g * dt
    q_new = lie.quat_normalize(lie.quat_mul(state.q, dq))

    # F_x (18x18), identity plus the blocks of `ErrorStateKF.cpp:101-107`.
    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.eye(18, dtype=dtype)
    F = F.at[0:3, 3:6].set(eye3 * dt)
    F = F.at[3:6, 6:9].set(-jnp.einsum("ij,jk->ik", R, lie.skew(a), precision=_HI) * dt)
    F = F.at[3:6, 9:12].set(-R * dt)
    F = F.at[3:6, 15:18].set(eye3 * dt)
    F = F.at[6:9, 6:9].set(lie.quat_to_mat(lie.quat_conj(dq)))
    F = F.at[6:9, 12:15].set(-eye3 * dt)

    # F_i Q_i F_iᵀ is diagonal, landing on error rows 3..15
    # (F_i = identity block at rows 3..15, `ErrorStateKF.cpp:43-44`).
    q_scaled = q_diag * jnp.concatenate([jnp.full(6, dt * dt), jnp.full(6, dt)])
    noise = jnp.zeros(18, dtype=dtype).at[3:15].set(q_scaled.astype(dtype))

    P_new = (
        jnp.einsum("ij,jk,lk->il", F, state.P, F, precision=_HI)
        + jnp.diag(noise)
    )
    P_new = 0.5 * (P_new + P_new.T)  # keep symmetric under f32 roundoff

    new = FilterState(p=p_new, v=v_new, q=q_new, ba=state.ba, bg=state.bg,
                      g=state.g, P=P_new)
    # Padded / negative-dt samples are no-ops (ref drops dt<0,
    # `ErrorStateKF.cpp:80-82`).
    keep = jnp.logical_and(valid, dt >= 0)
    return jax.tree.map(lambda n, o: jnp.where(keep, n, o), new, state)


def predict_chunk(
    state: FilterState, chunk: ImuChunk, noise: NoiseParams
) -> tuple[FilterState, StateHistory]:
    """Propagate through a whole ImuChunk with `lax.scan`; returns the final
    state and the pose history (initial state at index 0) for deskew."""
    final, hist, _ = predict_chunk_full(state, chunk, noise)
    return final, hist


def predict_chunk_full(
    state: FilterState, chunk: ImuChunk, noise: NoiseParams
):
    """`predict_chunk` that additionally returns the FULL per-sample state
    trajectory (p, q, P, v, ba, bg, g — each [M+1, ...] with the initial
    state at index 0).  Test/oracle plumbing: the f64-oracle suites compare
    every intermediate covariance, which the production path never needs."""

    def body(s: FilterState, x):
        dt, t_rel, gyro, accel, valid = x
        s_new = predict_step(s, dt, gyro, accel, noise.q_diag, valid)
        return s_new, (s_new.p, s_new.q, s_new.P, s_new.v, s_new.ba, s_new.bg, s_new.g)

    final, (ps, qs, Ps, vs, bas, bgs, gs) = jax.lax.scan(
        body, state, (chunk.dt, chunk.t_rel, chunk.gyro, chunk.accel, chunk.valid)
    )

    hist = StateHistory(
        t_rel=jnp.concatenate(
            [jnp.full((1,), -jnp.inf, chunk.t_rel.dtype), chunk.t_rel]
        ),
        p=jnp.concatenate([state.p[None], ps], axis=0),
        q=jnp.concatenate([state.q[None], qs], axis=0),
        valid=jnp.concatenate(
            [jnp.ones((1,), bool), jnp.logical_and(chunk.valid, chunk.dt >= 0)]
        ),
    )
    full_hist = (
        jnp.concatenate([state.p[None], ps], 0),
        jnp.concatenate([state.q[None], qs], 0),
        jnp.concatenate([state.P[None], Ps], 0),
        jnp.concatenate([state.v[None], vs], 0),
        jnp.concatenate([state.ba[None], bas], 0),
        jnp.concatenate([state.bg[None], bgs], 0),
        jnp.concatenate([state.g[None], gs], 0),
    )
    return final, hist, full_hist


def predict_chunk_prefix(
    state: FilterState,
    chunk: ImuChunk,
    noise: NoiseParams,
    base_mask: jnp.ndarray | None = None,
) -> tuple[FilterState, StateHistory]:
    """Parallel-prefix IMU propagation — the TPU-shaped replacement for the
    sequential `predict_chunk`.

    The recurrences are all associative, so instead of M dependent tiny
    steps (dispatch-latency bound on TPU) the chunk collapses into ~15
    batched kernels:

    * attitude: q_i = q_0 ⊗ dq_1 ⊗ … ⊗ dq_i — `associative_scan` of
      quaternion products (log₂M rounds of batched Hamilton products);
    * velocity/position: cumsums of u_j = R_{j-1}·a_j + g terms;
    * covariance: P_base = S_0 P S_0ᵀ + Σ_i S_i D_i S_iᵀ with suffix
      transition products S_i = F_n···F_{i+1} from a reverse
      `associative_scan` of batched 18×18 matmuls (MXU work).

    `base_mask` ([M] bool) selects the prefix of samples the returned state
    integrates (valid & t ≤ scan end); masked samples contribute F=I, D=0,
    dq=1 — so the result is exactly the state at the last base sample, while
    the returned `StateHistory` still covers ALL samples (the overhang poses
    are needed for deskew interpolation past scan end).  Numerically this
    regroups f32 products relative to the sequential form; the test suite
    bounds the divergence against the sequential reference.
    """
    dtype = state.p.dtype
    m = chunk.dt.shape[0]
    dt = chunk.dt.astype(dtype)
    ok = jnp.logical_and(chunk.valid, dt >= 0)
    if base_mask is None:
        base_mask = ok
    bmask = jnp.logical_and(ok, base_mask)

    dt_ok = jnp.where(ok, dt, 0.0)
    a = jnp.where(ok[:, None], chunk.accel - state.ba, 0.0)
    w = jnp.where(ok[:, None], chunk.gyro - state.bg, 0.0)

    # --- attitude prefix ---------------------------------------------------
    dq = lie.quat_exp(w * dt_ok[:, None])  # identity where masked (w·dt=0)
    q_prefix = jax.lax.associative_scan(lie.quat_mul, dq)  # [M,4]
    q_all = lie.quat_normalize(lie.quat_mul(state.q[None], q_prefix))
    q_hist = jnp.concatenate([state.q[None], q_all], axis=0)  # [M+1,4]
    R_prev = lie.quat_to_mat(q_hist[:-1])  # R_{j-1}, [M,3,3]

    # --- velocity / position cumsums --------------------------------------
    u = (
        jnp.einsum("mij,mj->mi", R_prev, a, precision=_HI)
        + state.g[None]
    )  # [M,3]
    dv = u * dt_ok[:, None]
    v_all = state.v[None] + jnp.cumsum(dv, axis=0)  # v after sample j
    v_prev = jnp.concatenate([state.v[None], v_all[:-1]], axis=0)
    dp = v_prev * dt_ok[:, None] + 0.5 * u * (dt_ok * dt_ok)[:, None]
    p_all = state.p[None] + jnp.cumsum(dp, axis=0)
    p_hist = jnp.concatenate([state.p[None], p_all], axis=0)

    hist = StateHistory(
        t_rel=jnp.concatenate(
            [jnp.full((1,), -jnp.inf, chunk.t_rel.dtype), chunk.t_rel]
        ),
        p=p_hist,
        q=q_hist,
        valid=jnp.concatenate([jnp.ones((1,), bool), ok]),
    )

    # --- base nominal state (gather at last base sample) -------------------
    # history index of the LAST base sample (robust to no-op gaps mid-chunk)
    n_base = jnp.max(
        jnp.where(bmask, jnp.arange(1, m + 1, dtype=jnp.int32), 0)
    )
    base_p = p_hist[n_base]
    base_q = q_hist[n_base]
    base_v = jnp.concatenate([state.v[None], v_all], axis=0)[n_base]

    # --- covariance via suffix transition products -------------------------
    # F_i blocks (ref `ErrorStateKF.cpp:101-107`), masked to identity beyond
    # the base prefix.
    dt_b = jnp.where(bmask, dt, 0.0)
    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((m, 18, 18), dtype)
    F = F.at[:, jnp.arange(18), jnp.arange(18)].set(1.0)
    F = F.at[:, 0:3, 3:6].set(eye3[None] * dt_b[:, None, None])
    Ra_skew = jnp.einsum(
        "mij,mjk->mik", R_prev, lie.skew(a), precision=_HI
    )
    F = F.at[:, 3:6, 6:9].set(-Ra_skew * dt_b[:, None, None])
    F = F.at[:, 3:6, 9:12].set(-R_prev * dt_b[:, None, None])
    F = F.at[:, 3:6, 15:18].set(eye3[None] * dt_b[:, None, None])
    dq_conj_mat = lie.quat_to_mat(lie.quat_conj(dq))
    F = F.at[:, 6:9, 6:9].set(
        jnp.where(bmask[:, None, None], dq_conj_mat, eye3[None])
    )
    F = F.at[:, 6:9, 12:15].set(-eye3[None] * dt_b[:, None, None])

    # suffix products S_i = F_n ··· F_{i+1}:
    #   rev = F reversed; prefix_k = rev_1 @ ... @ rev_k  =>  S_{n-k} = prefix_k
    rev = F[::-1]
    matmul = lambda x, y: jnp.einsum("mij,mjk->mik", x, y, precision=_HI)
    prefix = jax.lax.associative_scan(matmul, rev)  # [M,18,18]
    S_full = prefix[-1]  # F_n ··· F_1
    # S_i for i = 1..M : S_i = prefix[M-1-i] for i < M, S_M = I
    S = jnp.concatenate(
        [prefix[::-1][1:], jnp.eye(18, dtype=dtype)[None]], axis=0
    )  # [M,18,18], S[i-1] == S_i

    q_scaled = noise.q_diag[None, :] * jnp.concatenate(
        [
            jnp.tile((dt_b * dt_b)[:, None], (1, 6)),
            jnp.tile(dt_b[:, None], (1, 6)),
        ],
        axis=1,
    )  # [M,12]
    D = jnp.zeros((m, 18), dtype).at[:, 3:15].set(q_scaled.astype(dtype))

    P_base = (
        jnp.einsum("ij,jk,lk->il", S_full, state.P, S_full, precision=_HI)
        + jnp.einsum("mij,mj,mkj->ik", S, D, S, precision=_HI)
    )
    P_base = 0.5 * (P_base + P_base.T)

    base = FilterState(
        p=base_p, v=base_v, q=base_q,
        ba=state.ba, bg=state.bg, g=state.g, P=P_base,
    )
    return base, hist


def state_at(full_hist, idx: jnp.ndarray) -> FilterState:
    """Gather the full filter state at history index `idx` (the reference's
    rollback-to-last-state-before-scan-end, `ErrorStateKF.cpp:120-126`)."""
    ps, qs, Ps, vs, bas, bgs, gs = full_hist
    return FilterState(
        p=ps[idx], v=vs[idx], q=qs[idx], ba=bas[idx], bg=bgs[idx],
        g=gs[idx], P=Ps[idx],
    )


def pose_update(
    state: FilterState, observed: Pose, noise: NoiseParams
) -> FilterState:
    """6-DoF pose measurement update (ref `ErrorStateKF.cpp:127-145`).

    The observation is the ICP-aligned pose; the guess is the state's own
    pose, so the residual is [t_obs − p, Log(Rᵀ_state · R_obs)].
    H selects (δp, δθ):  K = P Hᵀ (H P Hᵀ + V)⁻¹;  P ← (I − K H) P
    (Joseph form deliberately not used — matches `ErrorStateKF.cpp:140-142`);
    inject; reset with G[θθ] = I − ½[δθ]× (`ErrorStateKF.cpp:174-180`).
    """
    dtype = state.p.dtype
    R_state = lie.quat_to_mat(state.q)
    r_rot = lie.so3_log(
        jnp.einsum("ji,jk->ik", R_state, observed.R, precision=_HI)
    )
    residual = jnp.concatenate([observed.t - state.p, r_rot])

    # H P Hᵀ: rows/cols (0:3, 6:9) of P.
    sel = jnp.array([0, 1, 2, 6, 7, 8])
    PHt = state.P[:, sel]  # [18, 6]
    S = PHt[sel, :] + jnp.diag(noise.v_diag.astype(dtype))  # [6, 6]
    K = jnp.linalg.solve(S.T, PHt.T).T  # [18, 6] = P Hᵀ S⁻¹
    err = jnp.einsum("ij,j->i", K, residual, precision=_HI)  # [18]

    # P ← (I − K H) P
    KH = jnp.zeros((18, 18), dtype=dtype).at[:, sel].set(K)
    P_new = state.P - jnp.einsum("ij,jk->ik", KH, state.P, precision=_HI)

    # inject (ref `ErrorStateKF.cpp:164-172`)
    dtheta = err[6:9]
    new = FilterState(
        p=state.p + err[0:3],
        v=state.v + err[3:6],
        q=lie.quat_normalize(lie.quat_mul(state.q, lie.quat_exp(dtheta))),
        ba=state.ba + err[9:12],
        bg=state.bg + err[12:15],
        g=state.g + err[15:18],
        P=P_new,
    )

    # reset (ref `ErrorStateKF.cpp:174-180`)
    G_theta = jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(dtheta)
    G = jnp.eye(18, dtype=dtype).at[6:9, 6:9].set(G_theta)
    P_reset = jnp.einsum("ij,jk,lk->il", G, new.P, G, precision=_HI)
    P_reset = 0.5 * (P_reset + P_reset.T)
    return new._replace(P=P_reset)


def pose_of(state: FilterState) -> Pose:
    return Pose(R=lie.quat_to_mat(state.q), t=state.p)
