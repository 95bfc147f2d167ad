"""Sharded-map odometry vs single-device equivalence on an 8-virtual-device
CPU mesh (BASELINE configs 4-5 analogue: partitioned map blocks with
collective-reduced VGICP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.parallel.sharded_map import ShardedOdometry
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
)


@pytest.fixture(scope="module")
def seq():
    return dataset.make_synthetic_sequence(
        duration=3.0, points_per_scan=8000, seed=7
    )


def run(odo_obj, seq, n=None):
    odo_obj.run(seq, max_scans=n)
    return odo_obj.positions


def test_sharded_matches_single_device(seq):
    single = run(Odometry(CFG), seq, n=12)
    sharded = run(ShardedOdometry(CFG, n_devices=8), seq, n=12)
    assert single.shape == sharded.shape
    # identical algorithm, different reduction order -> tiny f32 divergence
    # that compounds through the filter; trajectories must stay close
    np.testing.assert_allclose(sharded, single, atol=2e-2)


def test_sharded_tracks_ground_truth(seq):
    odo = ShardedOdometry(CFG, n_devices=8)
    odo.run(seq)
    est = odo.positions
    gt = seq.gt_positions[: len(est)]
    err = ate_rmse(est, gt, align=True)
    assert err < 0.2, f"sharded ATE {err:.3f}"


def test_sharded_map_is_partitioned(seq):
    """Each voxel key must live on exactly one shard."""
    from eskf_lio_tpu.ops import voxel as vx

    odo = ShardedOdometry(CFG, n_devices=8)
    odo.run(seq, max_scans=5)
    n_dev = 8
    sub = CFG.hash_capacity // n_dev
    keys = np.asarray(odo.voxmap.keys).reshape(n_dev, sub, 3)
    occ = np.asarray(odo.voxmap.live()).reshape(n_dev, sub)
    total = 0
    for d in range(n_dev):
        k = keys[d][occ[d]]
        if len(k) == 0:
            continue
        owners = np.asarray(vx.owner_hash(jnp.asarray(k), n_dev))
        assert np.all(owners == d), f"shard {d} holds foreign keys"
        total += len(k)
    assert total > 500


def test_sharded_different_device_counts(seq):
    """Result should be independent of the shard count (modulo f32 noise)."""
    p2 = run(ShardedOdometry(CFG, n_devices=2), seq, n=8)
    p8 = run(ShardedOdometry(CFG, n_devices=8), seq, n=8)
    np.testing.assert_allclose(p2, p8, atol=2e-2)


def test_per_device_compute_scales(monkeypatch, seq):
    """The GN loop must run on an owner-compacted N/D·slack slice, not the
    full scan — per-device einsum shapes scale with 1/D (VERDICT r2 #1)."""
    from eskf_lio_tpu.parallel import sharded_map as smod
    from eskf_lio_tpu.models import registration

    recorded: list[int] = []
    orig = registration.align

    def spy(scan, voxmap, guess, config, **kw):
        recorded.append(int(scan.points.shape[0]))
        return orig(scan, voxmap, guess, config, **kw)

    monkeypatch.setattr(smod.registration, "align", spy)
    odo = ShardedOdometry(CFG, n_devices=8)
    odo.run(seq, max_scans=3)
    s_expected = smod.slice_capacity(CFG.max_scan_points, 8, CFG.shard_slack)
    assert s_expected * 2 <= CFG.max_scan_points, "slice must shrink the work"
    assert recorded, "align never traced"
    assert all(s == s_expected for s in recorded), recorded


def test_no_slice_overflow(seq):
    """With the default slack, owner slices must not overflow on a uniform
    scan (overflow = silently dropped correspondences/inserts)."""
    odo = ShardedOdometry(CFG, n_devices=8)
    odo.run(seq, max_scans=10)
    gn_of = [int(d["gn_slice_overflow"]) for d in odo.diags]
    ins_of = [int(d["insert_slice_overflow"]) for d in odo.diags]
    assert sum(gn_of) == 0, gn_of
    assert sum(ins_of) == 0, ins_of
