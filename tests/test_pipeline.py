"""End-to-end LIO loop on a synthetic sequence (BASELINE config 3 analogue):
trajectory must track ground truth within an ATE bound."""

import numpy as np
import jax.numpy as jnp
import pytest

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline.odometry import Odometry
from eskf_lio_tpu.utils.metrics import ate_rmse

# small capacities -> fast CPU tests
CFG = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    # measurement noise matched to this workload's ICP accuracy (~1 cm /
    # ~0.3 deg at 12k pts/scan); the reference's 1e-6 values assume dense
    # 64k-point Hesai sweeps
    translation_noise=1e-4,
    rotation_noise=3e-5,
    max_raw_points=16384,
    max_scan_points=8192,
    max_imu_per_scan=48,
    hash_capacity_log2=17,
)


@pytest.fixture(scope="module")
def seq():
    return dataset.make_synthetic_sequence(
        duration=6.0, points_per_scan=12000, seed=3
    )


def init_state_with_velocity(cfg, seq):
    """Start the filter with the true initial velocity expressed in the
    odometry frame (body frame at the first scan end).  The ramped synthetic
    trajectory starts near rest, so this is a small correction."""
    traj = dataset.AnalyticTrajectory(dataset.TrajectoryParams())
    t0 = seq.scans[0].end_time - 1000.0
    _, R0 = traj.pose(np.asarray([t0]))
    v_w = traj.velocity(np.asarray([t0]))[0]
    v_body = R0[0].T @ v_w
    return eskf.init_state(cfg)._replace(v=jnp.asarray(v_body, jnp.float32))


def test_full_loop_tracks_ground_truth(seq):
    odo = Odometry(CFG, init_state=init_state_with_velocity(CFG, seq))
    odo.run(seq)
    assert len(odo.trajectory_t) == len(seq.scans)

    est = odo.positions
    gt = seq.gt_positions[: len(est)]
    err = ate_rmse(est, gt, align=True)
    # exact IMU, exact scans: the loop should track tightly
    assert err < 0.15, f"ATE {err:.3f} m too large"

    # diagnostics sanity
    conv = [bool(d["icp_converged"]) for d in odo.diags]
    assert np.mean(conv) > 0.9
    corr = [int(d["num_correspondences"]) for d in odo.diags]
    assert np.median(corr) > 500
    assert odo.summary()["map_voxels"] > 1000


def test_loop_beats_dead_reckoning(seq):
    """With gyro bias the IMU-only solution drifts; updates must fix it."""
    bias = np.array([0.004, -0.003, 0.005])
    seq_b = dataset.make_synthetic_sequence(
        duration=6.0, points_per_scan=12000, seed=3, gyro_bias=bias
    )
    cfg = CFG  # filter does NOT know the bias -> must estimate it

    odo = Odometry(cfg, init_state=init_state_with_velocity(cfg, seq_b))
    odo.run(seq_b)
    est = odo.positions
    gt = seq_b.gt_positions[: len(est)]
    err_full = ate_rmse(est, gt, align=True)

    # dead reckoning: same filter, no measurement updates
    from eskf_lio_tpu.pipeline.odometry import make_predict_only
    from eskf_lio_tpu.types import ImuChunk

    predict = make_predict_only(cfg)
    s = init_state_with_velocity(cfg, seq_b)
    t_last = seq_b.scans[0].end_time
    recs = [r for r in seq_b.imu if r.t >= t_last]
    dead_pos, dead_t = [], []
    m = cfg.max_imu_per_scan
    for k in range(0, len(recs), m):
        blk = recs[k:k + m]
        n = len(blk)
        dt = np.zeros(m, np.float32)
        gy = np.zeros((m, 3), np.float32)
        ac = np.zeros((m, 3), np.float32)
        va = np.zeros(m, bool)
        prev = t_last
        for i, r in enumerate(blk):
            dt[i] = r.t - prev
            gy[i] = r.gyro
            ac[i] = r.accel
            va[i] = True
            prev = r.t
        t_last = blk[-1].t
        chunk = ImuChunk(
            dt=jnp.asarray(dt), t_rel=jnp.asarray(np.zeros(m, np.float32)),
            gyro=jnp.asarray(gy), accel=jnp.asarray(ac), valid=jnp.asarray(va),
        )
        s = predict(s, chunk)
        dead_pos.append(np.asarray(s.p))
        dead_t.append(t_last)

    # sample dead-reckoning at scan times
    dead_pos = np.stack(dead_pos)
    dead_t = np.asarray(dead_t)
    idx = np.searchsorted(dead_t, seq_b.gt_times[: len(est)])
    idx = np.clip(idx, 0, len(dead_t) - 1)
    err_dead = ate_rmse(dead_pos[idx], gt, align=True)

    assert err_full < err_dead * 0.5, (
        f"LIO ATE {err_full:.3f} not clearly better than dead reckoning "
        f"{err_dead:.3f}"
    )
    assert err_full < 0.3


def test_npz_roundtrip(tmp_path, seq):
    path = str(tmp_path / "seq.npz")
    dataset.save_npz(path, seq)
    back = dataset.load_npz(path)
    assert len(back.imu) == len(seq.imu)
    assert len(back.scans) == len(seq.scans)
    np.testing.assert_allclose(back.imu[5].gyro, seq.imu[5].gyro)
    np.testing.assert_allclose(
        back.scans[2].points, seq.scans[2].points, atol=1e-6
    )
    np.testing.assert_allclose(back.gt_positions, seq.gt_positions)


def test_oversized_scan_truncation_is_counted():
    """A sweep beyond `max_raw_points` must surface the dropped count in the
    per-scan diagnostics (the reference never drops, `Subscriber.hpp:89-97`;
    a static budget must, and the loss may not be silent)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, max_raw_points=4096, max_scan_points=2048, hash_capacity_log2=14
    )
    big = dataset.make_synthetic_sequence(
        duration=1.2, points_per_scan=9000, seed=7
    )
    odo = Odometry(cfg)
    odo.run(big, max_scans=4)
    drops = [int(d["dropped_raw_points"]) for d in odo.diags]
    assert all(d >= 9000 - 4096 for d in drops), drops
