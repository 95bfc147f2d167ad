"""Sharded voxel map + compute-sharded shard_map'd odometry step.

This is the framework's distributed backend — the component the reference
does not have (its only parallelism is OpenMP fork/join and a two-thread
producer/consumer split; see SURVEY.md §2b).  Design:

* Mesh axis ``map`` over D devices.  The sorted voxel dictionary becomes D
  independent sub-dictionaries (one per device, `hash_capacity/D` slots
  each).  A voxel key belongs to exactly ONE device —
  `ops.voxel.owner_hash(key, D)` — and each shard keeps its own sorted
  order, so lookups/merges never cross shard boundaries.
* **Compute sharding by owner compaction**: before the GN loop each device
  compacts the points whose (guess-pose) voxels it owns into a static
  `ceil(N/D · slack)` slice — ONE variadic sort — and runs lookup,
  covariance rotation, and the JᵀWJ/JᵀWr einsums on the slice only, so
  per-device FLOPs scale as N/D.  A `psum` over ICI produces the global
  6×6/6 normal equations per iteration — per-point work stays local and
  42 floats cross the wire (the Schur-style trick of BASELINE.json's
  north star).  Correctness: the shard-local lookup is the exact
  ownership filter (an off-shard voxel key can never hit, and the skey
  packing is bijective), so over-claiming near voxel boundaries — the
  ±`shard_halo` box — only costs slice slots, never double counting.
* Insert is owner-compacted the same way (ownership exact — the post-update
  pose is fixed), so the per-device insert merge sorts over S + Δ rows,
  not N + Δ.  Eviction is purely local per shard (O(C/D)).
* Scan + filter state are replicated (tiny), as is the preprocess stage
  (deskew/downsample); see tools/profile_stages.py for per-stage numbers.
* Everything (predict → preprocess → compact → GN loop → update →
  insert/evict) runs inside ONE `shard_map` region under jit, so XLA
  overlaps the replicated compute with collectives.

Multi-host: `eskf_lio_tpu.parallel.distributed` wires
`jax.distributed.initialize`; build the mesh over `jax.devices()` and the
same code runs with DCN-crossing psums.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eskf_lio_tpu.config import Config
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration
from eskf_lio_tpu.ops import preprocess, sortmerge as sm, voxel as vx
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.types import FilterState, ImuChunk, Pose, ProcessedScan, Scan

# VoxelMap fields that are replicated (not sharded over the map axis):
# only the packing origin [3].  Round-4 lesson: NOTHING with per-shard
# dynamics may be declared replicated — the delta fill cursor used to be a
# "replicated" scalar that each shard advanced independently, and the
# out-spec silently collapsed the divergent copies (cursor = cross-shard
# sum => fold-on-every-insert + delta-row overwrites).  The cursor is now
# derived from per-shard liveness inside `vm.insert`.
_REPL_FIELDS = ("origin",)


def shard_map(body, mesh, in_specs, out_specs, check_rep=False):
    """Version shim: jax>=0.8 moved shard_map to jax.shard_map and renamed
    check_rep -> check_vma."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=check_rep,
    )


def slice_capacity(n_points: int, n_devices: int, slack: float) -> int:
    """Static per-device owner-slice capacity: ceil(N/D·slack) rounded up to
    a lane-aligned multiple of 128, capped at N (a 1-device mesh degrades to
    the unsharded shapes)."""
    s = int(math.ceil(n_points / n_devices * slack))
    s = ((s + 127) // 128) * 128
    return min(s, n_points)


def _owner_candidates(
    pts: jnp.ndarray, halo: float, voxel_size: float, n_dev, my
) -> jnp.ndarray:
    """True where this device owns ANY voxel within the ±halo box around
    the point.  halo=0 reduces to exact single-voxel ownership."""
    if halo == 0.0:
        keys = vx.voxel_key(pts, voxel_size)
        return vx.owner_hash(keys, n_dev) == my
    cand = jnp.zeros(pts.shape[:-1], bool)
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                off = jnp.asarray([sx, sy, sz], pts.dtype) * halo
                keys = vx.voxel_key(pts + off, voxel_size)
                cand = jnp.logical_or(cand, vx.owner_hash(keys, n_dev) == my)
    return cand


def _compact_slice(cand: jnp.ndarray, arrays, s_cap: int):
    """Stable-sort rows so cand=True rows lead, then take the first `s_cap`.

    One 2-operand (key, iota) sort; each array rides on a row gather of the
    permutation (the compile-cost rule of `ops.sortmerge.sort_perm`).
    Returns (sliced_arrays, valid [s_cap] bool, overflow int32) where
    overflow counts candidates that did not fit the slice."""
    key = jnp.where(cand, 0, 1).astype(jnp.int32)
    out = sm.sort_perm(key, *arrays)
    valid = out[0][:s_cap] == 0
    res = [a[:s_cap] for a in out[2:]]
    n_cand = jnp.sum(cand.astype(jnp.int32))
    overflow = jnp.maximum(n_cand - s_cap, 0)
    return res, valid, overflow


def make_sharded_scan_step(config: Config, mesh: Mesh):
    """Build the jitted shard_map'd per-scan step.

    Signature matches `pipeline.odometry.make_scan_step`'s step, but the
    VoxelMap arrays are sharded along their slot axis over the ``map`` mesh
    axis (each device holds its own sub-table block) and the per-device GN
    and insert work runs on owner-compacted N/D-scaled slices.
    """
    axis = config.mesh_axis_name
    n_dev = mesh.shape[axis]
    noise = eskf.make_noise_params(config)
    T_il = odo.lidar_extrinsics(config)
    sub_capacity = config.hash_capacity // n_dev
    assert sub_capacity * n_dev == config.hash_capacity
    assert config.shard_halo < config.map_voxel_size, (
        "shard_halo must stay below one voxel so the ±halo box spans at "
        "most the 8 corner voxels"
    )
    # GN slice capped by the correspondence budget (config.align_capacity,
    # same rationale as the single-device align slice: the lookup is
    # latency-bound per query row); the insert slice keeps the full scan
    # budget so no map data is lost.
    s_cap_gn = slice_capacity(
        config.align_capacity, n_dev, config.shard_slack
    )
    s_cap = slice_capacity(config.max_scan_points, n_dev, config.shard_slack)

    repl = P()
    shard = P(axis)

    map_specs = vm.VoxelMap(
        **{f: (repl if f in _REPL_FIELDS else shard) for f in vm.VoxelMap._fields}
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

        # 4. owner-compact this device's GN work to a static N/D·slack slice
        guess = eskf.pose_of(base)
        pts_guess_w = guess.apply(processed.points)
        cand = jnp.logical_and(
            _owner_candidates(
                pts_guess_w, config.shard_halo, config.map_voxel_size,
                n_dev, my,
            ),
            processed.valid,
        )
        (s_pts, s_covp), s_valid, gn_overflow = _compact_slice(
            cand, (processed.points, vm.pack_cov(processed.covs)), s_cap_gn
        )
        sliced = ProcessedScan(
            points=s_pts, covs=vm.unpack_cov(s_covp), valid=s_valid
        )

        # 5. sharded VGICP: per-device slice lookup + psum'd normal eqs.
        # The local shard only stores owned voxels, so `hit` is the exact
        # ownership filter — a point over-claimed by two devices hits on
        # exactly one of them.
        def lookup_fn(pts):
            return vm.lookup(
                voxmap,
                pts,
                voxel_size=config.map_voxel_size,
                max_points_per_voxel=config.max_points_per_voxel,
            )

        def reduce_fn(JTJ, JTr, num_corr):
            return (
                jax.lax.psum(JTJ, axis),
                jax.lax.psum(JTr, axis),
                jax.lax.psum(num_corr, axis),
            )

        res = registration.align(
            sliced, None, guess, config,
            lookup_fn=lookup_fn, reduce_fn=reduce_fn,
        )

        # 6. replicated measurement update
        corrected = eskf.pose_update(base, res.pose, noise)
        T = eskf.pose_of(corrected)

        # 7. owner-compacted insert into the local shard (ownership exact:
        # the post-update pose is fixed)
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
        ins_cand = jnp.logical_and(
            processed.valid, vx.owner_hash(keys_w, n_dev) == my
        )
        (i_pts_w, i_covp), i_valid, ins_overflow = _compact_slice(
            ins_cand, (pts_world, vm.pack_cov(processed.covs)), s_cap
        )
        # rotate only the sliced covariances into world frame: R Σ Rᵀ
        covs_w = jnp.einsum(
            "ab,nbc,dc->nad", T.R, vm.unpack_cov(i_covp), T.R,
            precision="highest",
        )
        insert_mask = jnp.logical_and(i_valid, should_insert)
        voxmap, dropped = vm.insert(
            voxmap,
            i_pts_w,
            vm.pack_cov(covs_w),
            insert_mask,
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel,
        )

        # 8. eviction: purely local per shard
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
            # slice-capacity overflow counters (0 in healthy operation;
            # raise shard_slack if these fire)
            "gn_slice_overflow": jax.lax.psum(gn_overflow, axis),
            "insert_slice_overflow": jax.lax.psum(
                ins_overflow * should_insert.astype(jnp.int32), axis
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
        "gn_slice_overflow": repl,
        "insert_slice_overflow": repl,
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
    """First-scan path, owner-compacted per shard."""
    axis = config.mesh_axis_name
    n_dev = mesh.shape[axis]
    T_il = odo.lidar_extrinsics(config)
    s_cap = slice_capacity(config.max_scan_points, n_dev, config.shard_slack)
    repl = P()
    shard = P(axis)
    map_specs = vm.VoxelMap(
        **{f: (repl if f in _REPL_FIELDS else shard) for f in vm.VoxelMap._fields}
    )
    scan_specs = Scan(points=repl, t_rel=repl, valid=repl)

    def body(voxmap: vm.VoxelMap, scan: Scan):
        my = jax.lax.axis_index(axis)
        pts_imu = T_il.apply(scan.points)
        processed = preprocess.downsample_and_covariances(
            pts_imu, scan.valid, config
        )
        keys = vx.voxel_key(processed.points, config.map_voxel_size)
        cand = jnp.logical_and(
            processed.valid, vx.owner_hash(keys, n_dev) == my
        )
        (i_pts, i_covp), i_valid, overflow = _compact_slice(
            cand, (processed.points, vm.pack_cov(processed.covs)), s_cap
        )
        voxmap, dropped = vm.insert(
            voxmap,
            i_pts,
            i_covp,
            i_valid,
            voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel,
        )
        return voxmap, jax.lax.psum(dropped + overflow, axis)

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
    sharded across the mesh.

    Multi-host: after `parallel.distributed.initialize()` the default
    device list spans every process; the same step runs with DCN-crossing
    psums.  Each process feeds the identical sensor stream (lockstep
    ingestion); per-call inputs are lifted to fully-replicated global
    arrays, and replicated outputs (poses, diags) convert to numpy locally."""

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
        if jax.process_count() == 1:
            # place the map with the sharded layout (origin replicated)
            shard = NamedSharding(self.mesh, P(config.mesh_axis_name))
            repl = NamedSharding(self.mesh, P())
            self.voxmap = vm.VoxelMap(
                **{
                    f: jax.device_put(
                        getattr(self.voxmap, f),
                        repl if f in _REPL_FIELDS else shard,
                    )
                    for f in vm.VoxelMap._fields
                }
            )
        else:
            from eskf_lio_tpu.parallel import distributed as dist

            # global placement of the initial map across processes
            self.voxmap = vm.VoxelMap(
                **{
                    f: (
                        dist.replicate_to_mesh(
                            np.asarray(getattr(self.voxmap, f)), self.mesh
                        )
                        if f in _REPL_FIELDS
                        else dist.shard_to_mesh(
                            np.asarray(getattr(self.voxmap, f)),
                            self.mesh,
                            config.mesh_axis_name,
                        )
                    )
                    for f in vm.VoxelMap._fields
                }
            )
            raw_scan_step = self.scan_step
            raw_init_step = self.init_step

            def scan_step(*args):
                return raw_scan_step(
                    *dist.replicate_to_mesh(args, self.mesh)
                )

            def init_step(voxmap, scan):
                return raw_init_step(
                    voxmap, dist.replicate_to_mesh(scan, self.mesh)
                )

            self.scan_step = scan_step
            self.init_step = init_step


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
