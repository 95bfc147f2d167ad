"""Device-resident replay mode vs the streaming driver."""

import numpy as np
import pytest

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.pipeline import replay
from eskf_lio_tpu.pipeline.odometry import Odometry
from eskf_lio_tpu.utils.metrics import ate_rmse

CFG = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-4,
    rotation_noise=3e-5,
    max_raw_points=8192,
    max_scan_points=4096,
    max_imu_per_scan=48,
    hash_capacity_log2=16,
    scan_hash_capacity_log2=13,
    max_probe=32,
)


@pytest.fixture(scope="module")
def seq():
    return dataset.make_synthetic_sequence(
        duration=3.0, points_per_scan=8000, seed=7
    )


def test_replay_matches_streaming(seq):
    stream = Odometry(CFG)
    stream.run(seq, max_scans=12)
    pos_r, rot_r, diags, voxmap = replay.run_replay(CFG, seq, max_scans=12)
    assert pos_r.shape[0] == 12
    np.testing.assert_allclose(pos_r, stream.positions, atol=5e-3)
    # diag parity on a robust marker
    conv_stream = [bool(d["icp_converged"]) for d in stream.diags]
    assert list(diags["icp_converged"]) == conv_stream


def test_replay_tracks_ground_truth(seq):
    pos, _, diags, _ = replay.run_replay(CFG, seq)
    gt = seq.gt_positions[: len(pos)]
    err = ate_rmse(pos, gt, align=True)
    assert err < 0.2, f"replay ATE {err:.3f}"
    assert diags["icp_converged"].mean() > 0.9


def test_replay_batched_equivalence(seq):
    p1, _, _, _ = replay.run_replay(CFG, seq, max_scans=13)
    p2, _, _, _ = replay.run_replay(CFG, seq, max_scans=13, batch=4)
    np.testing.assert_allclose(p1, p2, atol=1e-5)
