"""native/ref_filter.cpp — the reference-algorithm filter used for the
bench's measured denominator and ate_vs_ref metric — must build, run on a
synthetic sequence, and track ground truth.  Builds via make (skipped when
no toolchain)."""

import os
import subprocess

import numpy as np
import pytest

from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.utils.metrics import ate_rmse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "native", "ref_filter")


@pytest.fixture(scope="module")
def ref_filter_bin():
    try:
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native"), "ref_filter"],
            capture_output=True, timeout=120, check=True,
        )
    except Exception:
        if not os.path.exists(BIN):
            pytest.skip("no native toolchain and no prebuilt ref_filter")
    return BIN


def test_ref_filter_tracks_ground_truth(tmp_path, ref_filter_bin):
    seq = dataset.make_synthetic_sequence(
        duration=4.0, points_per_scan=12000, seed=11,
        imu_noise_gyro=4.9e-3, imu_noise_accel=0.0206,
        gyro_bias=np.array([0.002, -0.001, 0.0015]),
        accel_bias=np.array([0.02, -0.03, 0.01]),
    )
    seq_bin = str(tmp_path / "seq.bin")
    traj_bin = str(tmp_path / "traj.bin")
    dataset.save_seq_bin(seq_bin, seq)
    out = subprocess.run(
        [ref_filter_bin, seq_bin, traj_bin],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    import json

    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["scans"] == len(seq.scans)
    assert stats["map_voxels"] > 1000

    with open(traj_bin, "rb") as f:
        n = int(np.fromfile(f, np.int64, 1)[0])
        t = np.fromfile(f, np.float64, n)
        xyz = np.fromfile(f, np.float64, 3 * n).reshape(n, 3)
    assert n == len(seq.scans)
    assert np.all(np.diff(t) > 0)
    gt = np.asarray(seq.gt_positions)[:n]
    # the reference algorithm tracks this clip at sub-2 cm (measured ~0.7)
    assert ate_rmse(xyz, gt, align=True) < 0.02
