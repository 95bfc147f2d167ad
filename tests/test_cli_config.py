"""Config loader, CLI entrypoint, and failure-detection tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from eskf_lio_tpu.config import Config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_reference_schema():
    """The reference's own YAML must load unchanged."""
    cfg = load_config(os.path.join(REPO, "config", "hilti.yaml"))
    assert cfg.imu.update_rate == 400.0
    assert cfg.imu.bias_accel[0] == pytest.approx(0.06080652138668933)
    assert cfg.lidar_quat_xyzw[0] == pytest.approx(0.7071068)
    assert cfg.map_voxel_size == 0.3
    assert cfg.max_points_per_voxel == 1000
    assert cfg.icp_max_iterations == 100
    assert cfg.icp_cosine_threshold == 0.9999
    assert cfg.remove_distance_threshold == 100.0
    # tpu section
    assert cfg.max_raw_points == 131072
    assert cfg.hash_capacity == 1 << 19
    assert cfg.max_align_points == 16384
    assert cfg.align_capacity == 16384
    # align capacity can never exceed the scan budget
    assert Config(max_scan_points=8192).align_capacity == 8192
    assert Config(max_align_points=None).align_capacity == 32768


def test_noise_sigma_units():
    """Datasheet-unit conversion matches the reference
    (`ErrorStateKF.cpp:30-35`)."""
    cfg = Config()
    s = cfg.imu.noise_sigmas()
    rate_sqrt = np.sqrt(400.0)
    np.testing.assert_allclose(
        s["accel_noise"][0], 105.0e-6 * 9.81 * rate_sqrt
    )
    np.testing.assert_allclose(
        s["gyro_noise"][0], 0.014 * rate_sqrt * np.pi / 180.0
    )
    np.testing.assert_allclose(
        s["accel_walk"][0], 20.0 * rate_sqrt * 1e-3 * 9.81
    )


def test_config_hashable_static():
    """Config must be hashable (usable as a jit static argument)."""
    c1, c2 = Config(), Config()
    assert hash(c1) == hash(c2)
    assert c1 == c2


def test_divergence_flag():
    """Sustained loss of correspondences must raise the diverged flag
    (failure detection; the reference has none, SURVEY.md 5.3)."""
    from eskf_lio_tpu.config import ImuConfig
    from eskf_lio_tpu.io import dataset
    from eskf_lio_tpu.pipeline.odometry import Odometry

    cfg = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-4,
        rotation_noise=3e-5,
        max_raw_points=2048,
        max_scan_points=1024,
        max_imu_per_scan=48,
        hash_capacity_log2=14,
    )
    seq = dataset.make_synthetic_sequence(
        duration=2.2, points_per_scan=1500, seed=2
    )
    odo = Odometry(cfg)
    odo.zero_corr_limit = 3
    # teleport every scan far away: no correspondences ever
    for i, s in enumerate(seq.scans):
        s.points[:] = s.points + 1000.0 * (i + 1)
    odo.run(seq)
    assert odo.diverged
    assert odo.summary()["diverged"]


def test_cli_synthetic_replay(tmp_path):
    """End-to-end CLI smoke test: synthetic run, export, render."""
    out_pcd = str(tmp_path / "m.pcd")
    out_traj = str(tmp_path / "t.json")
    out_png = str(tmp_path / "v.png")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [
            sys.executable, "-m", "eskf_lio_tpu.cli",
            "--synthetic", "1.5", "--points-per-scan", "3000",
            "--replay", "--cloud-out", out_pcd, "--traj-out", out_traj,
            "--viz", out_png,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "scans/s" in proc.stdout
    assert os.path.getsize(out_pcd) > 1000
    assert os.path.getsize(out_png) > 10000


def test_cli_stream_vizlive_densecloud(tmp_path):
    """CLI smoke test for the streaming mode with --viz-live (per-loop
    visualization role, `LocalMap.cpp:120-130`) and --dense-cloud export."""
    cfg = tmp_path / "small.yaml"
    cfg.write_text(
        "imu:\n  frequency: 400.0\n"
        "local_map:\n  map_resolution: 0.3\n"
        "tpu:\n"
        "  max_raw_points: 8192\n"
        "  max_scan_points: 4096\n"
        "  max_imu_per_scan: 48\n"
        "  hash_capacity_log2: 15\n"
    )
    out_pcd = str(tmp_path / "m.pcd")
    out_traj = str(tmp_path / "t.json")
    live_png = str(tmp_path / "live.png")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [
            sys.executable, "-m", "eskf_lio_tpu.cli",
            "--config", str(cfg),
            "--synthetic", "1.5", "--points-per-scan", "3000",
            "--stream", "--viz-live", live_png, "--viz-every", "4",
            "--dense-cloud", "4",
            "--cloud-out", out_pcd, "--traj-out", out_traj,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "live view rendered" in proc.stdout
    assert os.path.getsize(live_png) > 10000
    assert os.path.getsize(out_pcd) > 1000
