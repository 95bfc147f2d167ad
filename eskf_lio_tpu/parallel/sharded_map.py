"""Sharded voxel map + shard_map'd odometry step.

This is the framework's distributed backend — the component the reference
does not have (its only parallelism is OpenMP fork/join and a two-thread
producer/consumer split; see SURVEY.md §2b).  Design:

* Mesh axis ``map`` over D devices.  The sorted voxel dictionary becomes D
  independent sub-dictionaries (one per device, `hash_capacity/D` slots
  each).  A voxel key belongs to exactly ONE device —
  `ops.voxel.owner_hash(key, D)` — and each shard keeps its own sorted
  order, so lookups/merges never cross shard boundaries.
* Scan + filter state are replicated (tiny).  Per GN iteration each device
  looks up only the correspondences it owns, accumulates partial
  JᵀWJ ∈ ℝ⁶ˣ⁶ / JᵀWr ∈ ℝ⁶, and a `psum` over ICI produces the global
  normal equations — per-point work stays local; 42 floats cross the wire
  per iteration (the Schur-style trick of BASELINE.json's north star).
* Insert/evict are owner-masked: each device inserts only its keys into its
  local block.  No communication at all on the map-maintenance path.
* Everything (predict → preprocess → GN loop → update → insert/evict) runs
  inside ONE `shard_map` region under jit, so XLA overlaps the replicated
  compute with collectives.

Multi-host: build the mesh over `jax.devices()` after
`jax.distributed.initialize()`; the same code runs with DCN-crossing psums.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration
from eskf_lio_tpu.ops import preprocess, voxel as vx
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.types import FilterState, ImuChunk, Pose, Scan

from jax.experimental.shard_map import shard_map


def make_sharded_scan_step(config: Config, mesh: Mesh):
    """Build the jitted shard_map'd per-scan step.

    Signature matches `pipeline.odometry.make_scan_step`'s step, but the
    VoxelMap arrays are sharded along their slot axis over the ``map`` mesh
    axis (each device holds its own sub-table block).
    """
    axis = config.mesh_axis_name
    n_dev = mesh.shape[axis]
    noise = eskf.make_noise_params(config)
    T_il = odo.lidar_extrinsics(config)
    sub_capacity = config.hash_capacity // n_dev
    assert sub_capacity * n_dev == config.hash_capacity

    repl = P()
    shard = P(axis)

    map_specs = vm.VoxelMap(
        **{f: (repl if f == "origin" else shard) for f in vm.VoxelMap._fields}
    )
    chunk_specs = ImuChunk(
        dt=repl, t_rel=repl, gyro=repl, accel=repl, valid=repl
    )
    scan_specs = Scan(points=repl, t_rel=repl, valid=repl)
    state_specs = FilterState(
        p=repl, v=repl, q=repl, ba=repl, bg=repl, g=repl, P=repl
    )

    def body(
        state: FilterState,
        voxmap: vm.VoxelMap,  # local shard: [sub_capacity, ...]
        prev_R,
        prev_t,
        chunk: ImuChunk,
        scan: Scan,
        do_evict,
    ):
        my = jax.lax.axis_index(axis)

        # 1-3. predict + rollback + preprocess: replicated identical compute
        base, hist = eskf.predict_chunk_prefix(
            state, chunk, noise, base_mask=chunk.t_rel <= 0.0
        )
        processed = preprocess.preprocess(scan, hist, T_il, config)

        # 4. sharded VGICP: local lookup on owned keys + psum'd normal eqs
        def lookup_fn(pts):
            keys = vx.voxel_key(pts, config.map_voxel_size)
            owned = vx.owner_hash(keys, n_dev) == my
            mu, cov_packed, hit = vm.lookup(
                voxmap,
                pts,
                voxel_size=config.map_voxel_size,
                max_points_per_voxel=config.max_points_per_voxel,
            )
            return mu, vm.unpack_cov(cov_packed), jnp.logical_and(hit, owned)

        def reduce_fn(JTJ, JTr, num_corr):
            return (
                jax.lax.psum(JTJ, axis),
                jax.lax.psum(JTr, axis),
                jax.lax.psum(num_corr, axis),
            )

        guess = eskf.pose_of(base)
        res = registration.align(
            processed, None, guess, config,
            lookup_fn=lookup_fn, reduce_fn=reduce_fn,
        )

        # 5. replicated measurement update
        corrected = eskf.pose_update(base, res.pose, noise)
        T = eskf.pose_of(corrected)

        # 6. owner-masked insert into the local shard
        moved_R = jnp.einsum("ji,jk->ik", prev_R, T.R, precision="highest")
        moved_t = jnp.einsum(
            "ji,j->i", prev_R, T.t - prev_t, precision="highest"
        )
        cosine = 0.5 * (jnp.trace(moved_R) - 1.0)
        should_insert = jnp.logical_or(
            cosine < config.map_update_cosine_threshold,
            jnp.sum(moved_t * moved_t)
            > config.map_update_translation_sq_threshold,
        )
        pts_world = T.apply(processed.points)
        keys_w = vx.voxel_key(pts_world, config.map_voxel_size)
        owned = vx.owner_hash(keys_w, n_dev) == my
        insert_mask = jnp.logical_and(
            jnp.logical_and(processed.valid, should_insert), owned
        )
        covs_w = jnp.einsum(
            "ab,nbc,dc->nad", T.R, processed.covs, T.R, precision="highest"
        )
        voxmap, dropped = vm.insert(
            voxmap,
            pts_world,
            vm.pack_cov(covs_w),
            insert_mask,
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel,
            max_probe=config.max_probe,
        )

        # 7. eviction: purely local per shard
        def evict(m):
            return vm.evict_beyond(
                m,
                T.t,
                voxel_size=config.map_voxel_size,
                distance_threshold=config.remove_distance_threshold,
                max_points_per_voxel=config.max_points_per_voxel,
            )

        voxmap, removed = jax.lax.cond(
            jnp.logical_and(
                do_evict, jnp.asarray(config.remove_distant_points)
            ),
            evict,
            lambda m: (m, jnp.asarray(0, jnp.int32)),
            voxmap,
        )

        diag = {
            "icp_iterations": res.iterations,
            "icp_converged": res.converged,
            "num_correspondences": res.num_correspondences,
            "inserted": should_insert,
            "dropped_points": jax.lax.psum(dropped, axis),
            "removed_voxels": jax.lax.psum(removed, axis),
            "num_scan_points": jnp.sum(processed.valid.astype(jnp.int32)),
            "pose_finite": jnp.logical_and(
                jnp.all(jnp.isfinite(T.t)), jnp.all(jnp.isfinite(T.R))
            ),
        }
        return corrected, voxmap, T.R, T.t, diag

    diag_specs = {
        "icp_iterations": repl,
        "icp_converged": repl,
        "num_correspondences": repl,
        "inserted": repl,
        "dropped_points": repl,
        "removed_voxels": repl,
        "num_scan_points": repl,
        "pose_finite": repl,
    }

    step = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            state_specs, map_specs, repl, repl, chunk_specs, scan_specs, repl
        ),
        out_specs=(state_specs, map_specs, repl, repl, diag_specs),
        check_rep=False,
    )
    return jax.jit(step)


def make_sharded_init_step(config: Config, mesh: Mesh):
    """First-scan path, owner-masked per shard."""
    axis = config.mesh_axis_name
    n_dev = mesh.shape[axis]
    T_il = odo.lidar_extrinsics(config)
    repl = P()
    shard = P(axis)
    map_specs = vm.VoxelMap(
        **{f: (repl if f == "origin" else shard) for f in vm.VoxelMap._fields}
    )
    scan_specs = Scan(points=repl, t_rel=repl, valid=repl)

    def body(voxmap: vm.VoxelMap, scan: Scan):
        my = jax.lax.axis_index(axis)
        pts_imu = T_il.apply(scan.points)
        processed = preprocess.downsample_and_covariances(
            pts_imu, scan.valid, config
        )
        keys = vx.voxel_key(processed.points, config.map_voxel_size)
        owned = vx.owner_hash(keys, n_dev) == my
        voxmap, dropped = vm.insert(
            voxmap,
            processed.points,
            vm.pack_cov(processed.covs),
            jnp.logical_and(processed.valid, owned),
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel,
            max_probe=config.max_probe,
        )
        return voxmap, jax.lax.psum(dropped, axis)

    step = shard_map(
        body,
        mesh=mesh,
        in_specs=(map_specs, scan_specs),
        out_specs=(map_specs, repl),
        check_rep=False,
    )
    return jax.jit(step)


class ShardedOdometry(odo.Odometry):
    """Drop-in multi-device variant of the host driver: same interface, map
    sharded across the mesh."""

    def __init__(
        self,
        config: Config,
        n_devices: int | None = None,
        devices=None,
        init_state: FilterState | None = None,
    ):
        if devices is None:
            devices = jax.devices()[: n_devices or len(jax.devices())]
        self.mesh = Mesh(np.asarray(devices), (config.mesh_axis_name,))
        super().__init__(config, init_state=init_state)
        # override the compiled steps with sharded versions
        self.scan_step = make_sharded_scan_step(config, self.mesh)
        self.init_step = make_sharded_init_step(config, self.mesh)
        # place the map with the sharded layout (origin replicated)
        shard = NamedSharding(self.mesh, P(config.mesh_axis_name))
        repl = NamedSharding(self.mesh, P())
        self.voxmap = vm.VoxelMap(
            **{
                f: jax.device_put(
                    getattr(self.voxmap, f), repl if f == "origin" else shard
                )
                for f in vm.VoxelMap._fields
            }
        )


class ShardedOdometryRunner:
    """Minimal driver for the multichip dry-run: builds the mesh, runs one
    init + one scan step on tiny shapes."""

    def __init__(self, config: Config, n_devices: int):
        devices = jax.devices()
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        self.config = config
        self.odo = ShardedOdometry(config, n_devices=n_devices)

    def dryrun(self) -> None:
        import numpy as np
        from eskf_lio_tpu.io.dataset import ImuRecord, LidarRecord

        cfg = self.config
        rng = np.random.default_rng(0)
        t0 = 1000.0
        # scan 0 (init) + scan 1 (full sharded step)
        for k in (1, 2):
            t_end = t0 + 0.1 * k
            n = cfg.max_raw_points // 2
            pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
            ts = np.sort(rng.uniform(t_end - 0.1, t_end, n))
            rec = LidarRecord(
                points=pts, t=ts, start_time=float(ts[0]), end_time=t_end
            )
            # feed IMU covering the sweep
            for i in range(12):
                t_imu = t_end - 0.11 + 0.01 * (i + 1)
                self.odo.feed_imu(
                    ImuRecord(
                        t=t_imu,
                        gyro=0.01 * rng.standard_normal(3),
                        accel=np.array([0.0, 0.0, 9.81])
                        + 0.01 * rng.standard_normal(3),
                    )
                )
            out = self.odo.process_scan(rec)
            assert out is not None, "sharded step did not run"
        jax.block_until_ready(self.odo.voxmap)
