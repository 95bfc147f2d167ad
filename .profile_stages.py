"""Per-stage TPU timing for the LIO step, to find the bottleneck."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration
from eskf_lio_tpu.ops import preprocess as pp
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

config = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-4,
    rotation_noise=3e-5,
    max_raw_points=32768,
    max_scan_points=16384,
    max_imu_per_scan=64,
    hash_capacity_log2=19,
    scan_hash_capacity_log2=16,
    max_probe=32,
)
seq = dataset.make_synthetic_sequence(duration=13.0, points_per_scan=20000, seed=11)
init_scan, chunks, scans, evicts, _ = replay.pack_sequence(config, seq)
init_step = odo.make_init_step(config)
replay_step = replay.make_replay_step(config)

state = eskf.init_state(config)
voxmap = vm.VoxelMap.create(config.hash_capacity)
voxmap, _ = init_step(voxmap, init_scan)
prev_R, prev_t = jnp.eye(3), jnp.zeros(3)

sl = lambda a, s, e: jax.tree.map(lambda x: x[s:e], a)
# run 30 frames to get a realistic mid-run state
state, voxmap, prev_R, prev_t, _, ts_w, diags = replay_step(
    state, voxmap, prev_R, prev_t, sl(chunks, 0, 30), sl(scans, 0, 30), evicts[:30]
)
jax.block_until_ready(ts_w)
print("mid-run map voxels:", int(voxmap.num_voxels()))
print("avg icp iters (first 30):", float(np.mean(np.asarray(diags["icp_iterations"]))))

chunk = sl(chunks, 30, 31)
chunk1 = jax.tree.map(lambda x: x[0], chunk)
scan1 = jax.tree.map(lambda x: x[30], scans)

noise = eskf.make_noise_params(config)
T_il = odo.lidar_extrinsics(config)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return out


predict = jax.jit(lambda s, c: eskf.predict_chunk_prefix(s, c, noise, base_mask=c.t_rel <= 0.0))
base, hist = timeit("predict_chunk_prefix", predict, state, chunk1)

prep = jax.jit(lambda sc, h: pp.preprocess(sc, h, T_il, config))
processed = timeit("preprocess", prep, scan1, hist)

guess = eskf.pose_of(base)
align = jax.jit(lambda p, m, g: registration.align(p, m, g, config))
res = timeit("align (full while_loop)", align, processed, voxmap, guess)
print("   iters:", int(res.iterations), "corr:", int(res.num_correspondences))

# one lookup
lk = jax.jit(lambda m, pts: vm.lookup(m, pts, voxel_size=config.map_voxel_size,
                                      max_points_per_voxel=config.max_points_per_voxel))
pts_w = jax.jit(lambda g, p: g.apply(p))(guess, processed.points)
timeit("lookup (one GN iter's gather)", lk, voxmap, pts_w)

# normal equations alone
mu, covp, hit = lk(voxmap, pts_w)
covm = vm.unpack_cov(covp)
ne = jax.jit(registration.normal_equations)
mask = jnp.logical_and(processed.valid, hit)
timeit("normal_equations", ne, pts_w, processed.covs, mu, covm, mask)

upd = jax.jit(lambda b, p: eskf.pose_update(b, p, noise))
timeit("pose_update", upd, base, res.pose)

ins = jax.jit(lambda m, p, c, v: vm.insert(m, p, c, v, voxel_size=config.map_voxel_size,
                                           max_points_per_voxel=config.max_points_per_voxel))
covs_pk = vm.pack_cov(processed.covs)
timeit("map insert", ins, voxmap, pts_w, covs_pk, processed.valid)

ev = jax.jit(lambda m, c: vm.evict_beyond(m, c, voxel_size=config.map_voxel_size,
                                          distance_threshold=config.remove_distance_threshold,
                                          max_points_per_voxel=config.max_points_per_voxel))
timeit("evict (amortized 1/100 frames)", ev, voxmap, guess.t)

step = odo.make_scan_step(config)
timeit("FULL scan step", step, state, voxmap, prev_R, prev_t, chunk1, scan1, jnp.asarray(False), n=5)
