"""VoxelMap property tests vs a Python-dict reference model implementing the
reference semantics (`LocalMap.hpp:63-89`, `LocalMap.cpp:10-118`):
insert/lookup/evict, running mean+cov, 1000-point cap."""

import numpy as np
import jax
import jax.numpy as jnp

from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.ops import voxel as vx

VS = 0.3
CAP = 1 << 12  # small table to stress collisions


class DictMap:
    """Reference-semantics model (`LocalMap::Voxel::addPoint`,
    `LocalMap.hpp:79-87`)."""

    def __init__(self, max_points=1000):
        self.vox = {}
        self.max_points = max_points

    def insert(self, pts, covs):
        for p, c in zip(pts, covs):
            k = tuple(np.floor(p / VS).astype(np.int64))
            if k not in self.vox:
                self.vox[k] = [1, p.copy(), c.copy()]
            else:
                n, mean, cov = self.vox[k]
                if n < self.max_points:
                    self.vox[k] = [
                        n + 1,
                        (n * mean + p) / (n + 1),
                        (n * cov + c) / (n + 1),
                    ]

    def lookup(self, p):
        return self.vox.get(tuple(np.floor(p / VS).astype(np.int64)))


def rand_cloud(rng, n, scale=5.0):
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 0.01, (n, 1, 1))
    covs += rng.uniform(0, 0.001, size=(n, 1, 1)).astype(np.float32)
    return pts, covs


def do_insert(m, pts, covs, valid=None, max_points=1000):
    n = pts.shape[0]
    valid = np.ones(n, bool) if valid is None else valid
    return vm.insert(
        m,
        jnp.asarray(pts),
        vm.pack_cov(jnp.asarray(covs)),
        jnp.asarray(valid),
        voxel_size=VS,
        max_points_per_voxel=max_points,
    )


def test_pack_unpack_roundtrip(rng):
    c = rng.normal(size=(7, 3, 3)).astype(np.float32)
    c = c + np.swapaxes(c, -1, -2)
    back = np.asarray(vm.unpack_cov(vm.pack_cov(jnp.asarray(c))))
    np.testing.assert_array_equal(back, c)


def test_insert_lookup_roundtrip(rng):
    pts, covs = rand_cloud(rng, 2000)
    m = vm.VoxelMap.create(CAP)
    m, dropped = do_insert(m, pts, covs)
    assert int(dropped) == 0

    ref = DictMap()
    ref.insert(pts.astype(np.float64), covs.astype(np.float64))
    assert int(m.num_voxels()) == len(ref.vox)

    mean, cov, hit = vm.lookup(m, jnp.asarray(pts), voxel_size=VS)
    assert bool(jnp.all(hit))
    mean = np.asarray(mean)
    cov = np.asarray(vm.unpack_cov(cov))
    for i in range(0, 2000, 97):
        entry = ref.lookup(pts[i])
        assert entry is not None
        np.testing.assert_allclose(mean[i], entry[1], atol=1e-4)
        np.testing.assert_allclose(cov[i], entry[2], atol=1e-5)


def test_lookup_miss(rng):
    pts, covs = rand_cloud(rng, 100, scale=2.0)
    m = vm.VoxelMap.create(CAP)
    m, _ = do_insert(m, pts, covs)
    far = pts + 1000.0
    _, _, hit = vm.lookup(m, jnp.asarray(far), voxel_size=VS)
    assert not bool(jnp.any(hit))


def test_incremental_matches_dict(rng):
    """Multiple batches accumulate the same running stats as the sequential
    reference model."""
    m = vm.VoxelMap.create(CAP)
    ref = DictMap()
    all_pts = []
    for _ in range(5):
        pts, covs = rand_cloud(rng, 500, scale=3.0)
        m, dropped = do_insert(m, pts, covs)
        assert int(dropped) == 0
        ref.insert(pts.astype(np.float64), covs.astype(np.float64))
        all_pts.append(pts)
    assert int(m.num_voxels()) == len(ref.vox)
    probe_pts = np.concatenate(all_pts)[::31]
    mean, cov, hit = vm.lookup(
        m, jnp.asarray(probe_pts), voxel_size=VS
    )
    assert bool(jnp.all(hit))
    for i, p in enumerate(probe_pts):
        n, mref, cref = ref.lookup(p)
        np.testing.assert_allclose(np.asarray(mean)[i], mref, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(vm.unpack_cov(cov))[i], cref, atol=1e-5
        )


def test_point_cap(rng):
    """Cap semantics: counts clamp at max_points_per_voxel and the mean stops
    moving once full (`LocalMap.hpp:81`)."""
    max_pts = 8
    m = vm.VoxelMap.create(CAP)
    base = np.array([0.1, 0.1, 0.1], np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32), (max_pts, 1, 1))
    pts = np.tile(base, (max_pts, 1))
    m, _ = do_insert(m, pts, covs, max_points=max_pts)
    mean0, _, _ = vm.lookup(m, jnp.asarray(base[None]), voxel_size=VS)
    # full voxel: further inserts must not change the stats
    pts2 = np.tile(base + 0.05, (16, 1))
    covs2 = np.tile(np.eye(3, dtype=np.float32) * 5, (16, 1, 1))
    m, _ = do_insert(m, pts2, covs2, max_points=max_pts)
    mean1, _, _ = vm.lookup(m, jnp.asarray(base[None]), voxel_size=VS)
    np.testing.assert_array_equal(np.asarray(mean0), np.asarray(mean1))
    m, _ = vm.compact(m, max_points_per_voxel=max_pts)
    assert int(m.count.max()) == max_pts


def test_cap_cross_batch(rng):
    """A batch crossing the cap scales proportionally (documented deviation
    from first-k truncation)."""
    max_pts = 4
    m = vm.VoxelMap.create(CAP)
    base = np.array([0.1, 0.1, 0.1], np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    m, _ = do_insert(m, np.tile(base, (2, 1)), covs, max_points=max_pts)
    # batch of 4 more: only 2 fit, contribution scaled by 1/2
    pts2 = np.stack([base + [0.01, 0, 0]] * 4)
    covs2 = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    m, _ = do_insert(m, pts2.astype(np.float32), covs2, max_points=max_pts)
    mc, _ = vm.compact(m, max_points_per_voxel=max_pts)
    assert int(mc.count.max()) == max_pts
    mean, _, hit = vm.lookup(m, jnp.asarray(base[None]), voxel_size=VS)
    expect = (2 * base + 2 * (base + [0.01, 0, 0])) / 4
    np.testing.assert_allclose(np.asarray(mean)[0], expect, atol=1e-5)


def test_invalid_points_ignored(rng):
    pts, covs = rand_cloud(rng, 400)
    valid = rng.uniform(size=400) < 0.5
    m1 = vm.VoxelMap.create(CAP)
    m1, _ = do_insert(m1, pts, covs, valid=valid)
    m2 = vm.VoxelMap.create(CAP)
    m2, _ = do_insert(m2, pts[valid], covs[valid])
    assert int(m1.num_voxels()) == int(m2.num_voxels())
    q = pts[valid]
    mean1, cov1, h1 = vm.lookup(m1, jnp.asarray(q), voxel_size=VS)
    mean2, cov2, h2 = vm.lookup(m2, jnp.asarray(q), voxel_size=VS)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), atol=1e-5)


def test_evict(rng):
    pts, covs = rand_cloud(rng, 1000, scale=20.0)
    m = vm.VoxelMap.create(CAP)
    m, _ = do_insert(m, pts, covs)
    n_before = int(m.num_voxels())
    center = jnp.zeros(3)
    m2, removed = vm.evict_beyond(
        m, center, voxel_size=VS, distance_threshold=10.0
    )
    assert 0 < int(removed) < n_before
    assert int(m2.num_voxels()) == n_before - int(removed)
    # surviving voxels still resolvable, with identical stats
    dist = np.linalg.norm(pts, axis=-1)
    near = pts[dist < 9.0]  # margin: voxel center vs point position
    mean_a, cov_a, hit_a = vm.lookup(m, jnp.asarray(near), voxel_size=VS)
    mean_b, cov_b, hit_b = vm.lookup(m2, jnp.asarray(near), voxel_size=VS)
    assert bool(jnp.all(hit_b))
    np.testing.assert_array_equal(np.asarray(mean_a), np.asarray(mean_b))
    np.testing.assert_array_equal(np.asarray(cov_a), np.asarray(cov_b))
    # far voxels gone
    far = pts[dist > 12.0]
    _, _, hit_far = vm.lookup(m2, jnp.asarray(far), voxel_size=VS)
    assert not bool(jnp.any(hit_far))


def test_insert_jittable(rng):
    pts, covs = rand_cloud(rng, 256)
    m = vm.VoxelMap.create(CAP)

    @jax.jit
    def step(m, p, c, v):
        return vm.insert(
            m, p, c, v, voxel_size=VS, max_points_per_voxel=1000
        )

    m2, dropped = step(
        m, jnp.asarray(pts), vm.pack_cov(jnp.asarray(covs)), jnp.ones(256, bool)
    )
    assert int(dropped) == 0
    # second call reuses the compiled executable (no shape change)
    m3, _ = step(m2, jnp.asarray(pts), vm.pack_cov(jnp.asarray(covs)), jnp.ones(256, bool))
    assert int(m3.num_voxels()) == int(m2.num_voxels())


def test_high_load_factor(rng):
    """Fill to ~70% load: inserts must still mostly resolve (bounded drops —
    keys whose probe run exceeds the bound are dropped, not misplaced)."""
    n_pts = 2800  # nearly all-unique voxels -> ~68% load of the 4096 table
    pts = (rng.uniform(-50, 50, size=(n_pts, 3))).astype(np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 0.01, (n_pts, 1, 1))
    m = vm.VoxelMap.create(CAP)
    m, dropped = do_insert(m, pts, covs)
    ref = DictMap()
    ref.insert(pts.astype(np.float64), covs.astype(np.float64))
    assert int(dropped) < n_pts * 0.05
    assert int(m.num_voxels()) >= len(ref.vox) * 0.95
    # every resolved voxel must still be findable (drop, never misplace)
    mean, _, hit = vm.lookup(m, jnp.asarray(pts), voxel_size=VS)
    assert int(jnp.sum(hit)) >= int(m.num_voxels())


def test_lookup_across_tiers_after_epochs(rng):
    """The single-probe lookup must resolve main-only, delta-only and
    main+delta voxels (and miss elsewhere) with dict-oracle stats across
    several insert epochs — the merged view the inserts maintain must
    never go stale."""
    # 2x CAP: three epochs hold ~4.3k distinct voxels, which must all fit
    # (at CAP=4096 the 174-voxel main-table overflow is correctly counted
    # as drops — covered by test_high_load_factor)
    m = vm.VoxelMap.create(2 * CAP, CAP // 8)
    ref = DictMap()
    for seed in range(3):
        pts, covs = rand_cloud(np.random.default_rng(seed), 1500)
        m, dropped = do_insert(m, pts, covs)
        assert int(dropped) == 0
        ref.insert(pts.astype(np.float64), covs.astype(np.float64))
    q = np.concatenate([
        rand_cloud(np.random.default_rng(2), 1500)[0],  # recent (delta)
        rand_cloud(np.random.default_rng(0), 1500)[0],  # old (main)
        np.full((64, 3), 100.0, np.float32),  # misses
    ])
    mean, cov, hit = vm.lookup(m, jnp.asarray(q), voxel_size=VS)
    assert not bool(jnp.any(hit[-64:]))
    assert bool(jnp.all(hit[:-64]))
    for i in range(0, 3000, 113):
        entry = ref.lookup(q[i])
        np.testing.assert_allclose(
            np.asarray(mean)[i], entry[1], atol=1e-4
        )


def test_point_cap_across_epochs(rng):
    """A voxel saturating across multiple insert epochs stops accumulating
    (first-come gate, `LocalMap.hpp:81`), and the capped stats read the
    same before and after a fold."""
    base = np.array([0.1, 0.1, 0.1], np.float32)
    m = vm.VoxelMap.create(1 << 8, 1 << 6)
    for k in range(3):
        pts = np.tile(base, (40, 1)) + np.float32(k) * 1e-3
        covs = np.tile(np.eye(3, dtype=np.float32) * 0.01, (40, 1, 1))
        m, _ = do_insert(m, pts, covs, max_points=50)
    mean1, _, hit1 = vm.lookup(
        m, jnp.asarray(base[None]), voxel_size=VS, max_points_per_voxel=50
    )
    assert bool(hit1[0])
    # epochs 1 (40 pts) + 2 (10 of 40, scaled 1/4) fill the cap; epoch 3
    # must contribute nothing
    expect = (40 * base + 10 * (base + 1e-3)) / 50
    np.testing.assert_allclose(np.asarray(mean1)[0], expect, atol=1e-5)
    mc, _ = vm.compact(m, max_points_per_voxel=50)
    assert int(mc.count.max()) == 50
