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


def _delta_occupancy(voxmap, n_dev):
    """Per-shard delta liveness masks, [n_dev, d_cap/n_dev]."""
    from eskf_lio_tpu.map.voxel_map import INT32_MAX

    d_skey = np.asarray(voxmap.d_skey)
    return (d_skey != INT32_MAX).reshape(n_dev, -1)


def test_sharded_delta_tier_bookkeeping(seq):
    """Regression for the round-4 confirmed bug: the delta fill cursor was
    carried as a 'replicated' scalar that each shard advanced independently;
    the out-spec collapsed the divergent copies to their SUM, forcing
    fold-on-every-insert and overwriting live delta rows.  With the cursor
    derived from per-shard liveness, three invariants must hold on every
    scan of an 8-shard run:

    1. live delta rows form a contiguous prefix per shard (appends land at
       the liveness frontier, never past it);
    2. live delta keys are unique per shard (no row overwrites / aliases);
    3. the delta tier actually accumulates across scans — with a delta
       sized above the run's total distinct voxel count, NO fold may ever
       fire, so per-shard occupancy must be non-decreasing (the bug folded
       on every insert regardless of capacity)."""
    # ample delta: 2^15 global -> 4096 rows/shard > all distinct voxels
    # this 16-scan sequence produces, so a healthy run never folds
    cfg = dataclasses_replace(CFG, map_delta_log2=15)
    odo = ShardedOdometry(cfg, n_devices=8)
    occ_hist = []

    def check(o):
        n = len(occ_hist)
        occ = _delta_occupancy(o.voxmap, 8)
        d_skeys = np.asarray(o.voxmap.d_skey).reshape(8, -1)
        for d in range(8):
            live = occ[d]
            fill = int(live.sum())
            assert live[:fill].all() and not live[fill:].any(), (
                f"scan {n} shard {d}: delta liveness not a contiguous "
                f"prefix (fill={fill})"
            )
            keys = d_skeys[d][live]
            assert len(np.unique(keys)) == len(keys), (
                f"scan {n} shard {d}: duplicate delta keys (row overwrite)"
            )
        occ_hist.append(occ.sum(axis=1))

    odo.run(seq, max_scans=16, on_scan=check)
    occ_hist = np.stack(occ_hist)  # [n_scans, n_dev]
    # occupancy strictly accumulates per shard: any drop = a fold fired,
    # which the ample delta capacity above makes illegitimate
    diffs = np.diff(occ_hist, axis=0)
    assert (diffs >= 0).all(), (
        "delta occupancy dropped (unexpected fold) — per-shard totals:\n"
        f"{occ_hist.tolist()}"
    )
    assert occ_hist[-1].sum() > 0, "delta tier never accumulates"


def test_sharded_map_state_matches_single_device(seq):
    """Map-STATE parity D=8 vs D=1 (not just trajectories): distinct voxel
    count and total point mass must agree to f32-trajectory noise.  This is
    the test class that would have caught the round-4 cursor bug (which
    corrupted map contents while leaving 12-scan trajectories within
    2e-2)."""
    cfg = dataclasses_replace(CFG, remove_period=1.2)  # force evictions
    single = Odometry(cfg)
    sharded = ShardedOdometry(cfg, n_devices=8)
    single.run(seq, max_scans=24)
    sharded.run(seq, max_scans=24)

    def distinct_voxels(m):
        # exact host-side count across both tiers; `num_voxels()` assumes a
        # globally sorted main tier, which a block-sharded map is not
        from eskf_lio_tpu.map.voxel_map import INT32_MAX

        skey = np.asarray(m.skey)
        d_skey = np.asarray(m.d_skey)
        live = np.concatenate([skey[skey != INT32_MAX],
                               d_skey[d_skey != INT32_MAX]])
        return len(np.unique(live))

    nv_single = distinct_voxels(single.voxmap)
    nv_sharded = distinct_voxels(sharded.voxmap)
    assert nv_single > 1000
    assert abs(nv_sharded - nv_single) <= 0.02 * nv_single, (
        f"voxel count diverged: single={nv_single} sharded={nv_sharded}"
    )

    def point_mass(m):
        main = float(np.asarray(m.payload[:, 0]).sum())
        delta = float(np.asarray(m.d_payload[:, 0]).sum())
        return main + delta

    pm_single = point_mass(single.voxmap)
    pm_sharded = point_mass(sharded.voxmap)
    assert pm_single > 0
    assert abs(pm_sharded - pm_single) <= 0.02 * pm_single, (
        f"point mass diverged: single={pm_single} sharded={pm_sharded}"
    )


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_no_slice_overflow(seq):
    """With the default slack, owner slices must not overflow on a uniform
    scan (overflow = silently dropped correspondences/inserts)."""
    odo = ShardedOdometry(CFG, n_devices=8)
    odo.run(seq, max_scans=10)
    gn_of = [int(d["gn_slice_overflow"]) for d in odo.diags]
    ins_of = [int(d["insert_slice_overflow"]) for d in odo.diags]
    assert sum(gn_of) == 0, gn_of
    assert sum(ins_of) == 0, ins_of
