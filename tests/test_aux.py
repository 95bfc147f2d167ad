"""Auxiliary subsystems: checkpoint/resume round-trip, export formats,
offline viewer, profiling helpers."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset, export
from eskf_lio_tpu.pipeline.odometry import Odometry
from eskf_lio_tpu.utils import checkpoint
from eskf_lio_tpu.utils.profiling import Stopwatch

CFG = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-4,
    rotation_noise=3e-5,
    max_raw_points=8192,
    max_scan_points=4096,
    max_imu_per_scan=48,
    hash_capacity_log2=15,
)


@pytest.fixture(scope="module")
def short_seq():
    return dataset.make_synthetic_sequence(
        duration=2.0, points_per_scan=6000, seed=5
    )


def run_scans(odo, seq, start, stop):
    imu = [r for r in seq.imu]
    for scan in seq.scans[start:stop]:
        for r in imu:
            if odo.imu_pending and r.t <= odo.imu_pending[-1].t:
                continue
            if r.t <= scan.end_time + 0.05:
                odo.feed_imu(r)
        odo.process_scan(scan)


def test_checkpoint_resume_exact(tmp_path, short_seq):
    """Run A: scans 0..9 straight.  Run B: 0..4, checkpoint, restore into a
    fresh instance, 5..9.  Trajectories must match exactly."""
    seq = short_seq
    a = Odometry(CFG)
    a.run(seq, max_scans=10)

    b = Odometry(CFG)
    b.run(seq, max_scans=5)
    ckpt = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(ckpt, b)

    c = Odometry(CFG)
    checkpoint.load_checkpoint(ckpt, c)
    # continue: replay the remaining stream
    imu_iter = iter([r for r in seq.imu if r.t > c.t_last_update])
    next_imu = next(imu_iter, None)
    for scan in seq.scans[5:10]:
        while next_imu is not None and next_imu.t <= scan.end_time + 0.05:
            c.feed_imu(next_imu)
            next_imu = next(imu_iter, None)
        c.process_scan(scan)

    np.testing.assert_array_equal(
        np.stack(a.trajectory_p), np.stack(c.trajectory_p)
    )
    np.testing.assert_array_equal(
        np.asarray(a.voxmap.mean), np.asarray(c.voxmap.mean)
    )


def test_export_roundtrip(tmp_path, short_seq):
    odo = Odometry(CFG)
    odo.run(short_seq, max_scans=6)
    cloud = str(tmp_path / "map.pcd")
    traj = str(tmp_path / "traj.json")
    export.save_run(odo, cloud, traj)

    pts = export.read_pcd(cloud)
    assert len(pts) == int(odo.voxmap.num_voxels())
    times, Rs, ps = export.read_trajectory_json(traj)
    assert len(times) == len(odo.trajectory_t)
    np.testing.assert_allclose(
        np.asarray(ps), np.stack(odo.trajectory_p), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(Rs[2]), odo.trajectory_R[2], atol=1e-9
    )


def test_offline_viewer(tmp_path, short_seq):
    from eskf_lio_tpu.viz.visualize import render

    odo = Odometry(CFG)
    odo.run(short_seq, max_scans=4)
    cloud = str(tmp_path / "map.pcd")
    traj = str(tmp_path / "traj.json")
    export.save_run(odo, cloud, traj)
    out = str(tmp_path / "view.png")
    render(cloud, traj, out)
    assert os.path.getsize(out) > 10_000


def test_stopwatch():
    sw = Stopwatch()
    with sw.lap() as out:
        out["result"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert len(sw.laps) == 1
    assert sw.avg > 0
    assert "avg" in sw.summary()


def test_dense_cloud_export():
    """Export-parity option: up to K sampled points per voxel, concentrated
    around the voxel statistics (ref dense dump, `LocalMap.cpp:156-167`)."""
    from eskf_lio_tpu.map import voxel_map as vm

    rng = np.random.default_rng(3)
    # 64 voxel sites, 5 points each -> per-voxel counts of 5
    sites = rng.uniform(-5, 5, size=(64, 3)).astype(np.float32)
    pts = np.repeat(sites, 5, axis=0) + rng.normal(
        scale=0.02, size=(320, 3)
    ).astype(np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 1e-4, (320, 1, 1))
    m = vm.VoxelMap.create(1 << 12)
    m, _ = vm.insert(
        m, jnp.asarray(pts), vm.pack_cov(jnp.asarray(covs)),
        jnp.ones(320, bool), voxel_size=CFG.map_voxel_size,
        max_points_per_voxel=1000,
    )
    sparse, counts = export.map_to_cloud(m)
    assert counts.max() > 1
    dense = export.map_to_dense_cloud(m, samples_per_voxel=3)
    expected = int(np.minimum(counts, 3).sum())
    assert len(dense) == expected
    assert len(dense) > len(sparse)
    # determinism
    dense2 = export.map_to_dense_cloud(m, samples_per_voxel=3)
    np.testing.assert_array_equal(dense, dense2)
    # samples stay near their voxels: nearest sparse mean within ~2 voxels
    from scipy.spatial import cKDTree

    d, _ = cKDTree(sparse).query(dense)
    assert np.percentile(d, 99) < 2 * CFG.map_voxel_size


def test_live_viewer(tmp_path, short_seq):
    """--viz-live role (ref per-loop `visualizeLocalMap`,
    `LocalMap.cpp:120-130`): PNG re-rendered during the run without
    stalling the drivers."""
    from eskf_lio_tpu.viz.live import LiveViewer

    out = str(tmp_path / "live.png")
    viewer = LiveViewer(out, every=3)
    odo = Odometry(CFG)
    odo.run(short_seq, max_scans=7, on_scan=viewer.on_scan)
    viewer.close()
    assert viewer.renders >= 1
    assert os.path.getsize(out) > 10_000
