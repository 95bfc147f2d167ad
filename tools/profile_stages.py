"""Stage-by-stage timing of the per-scan hot path on the real chip.

Not part of the framework — a working tool for perf rounds.
"""

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
from eskf_lio_tpu.ops import preprocess
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay


def _sync(out):
    """Force a real device round-trip: fetch one scalar from the last
    result.  block_until_ready over the axon tunnel acks early and lies."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out  # ms


def main():
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-4,
        rotation_noise=3e-5,
        max_raw_points=32768,
        max_scan_points=16384,
        max_imu_per_scan=64,
        hash_capacity_log2=19,
    )
    seq = dataset.make_synthetic_sequence(
        duration=13.0, points_per_scan=20000, seed=11
    )
    init_scan, chunks, scans, evicts, updates, _ = replay.pack_sequence(
        config, seq
    )
    init_step = odo.make_init_step(config)

    state = eskf.init_state(config)
    voxmap = vm.VoxelMap.create(config.hash_capacity)
    voxmap, _ = init_step(voxmap, init_scan)

    # run ~40 scans of real replay to get a warm, realistic map + state
    rstep = replay.make_replay_step(config)
    sl = lambda a, s, e: jax.tree.map(lambda x: x[s:e], a)
    nwarm = 40
    state, voxmap, prev_R, prev_t, _, ts_w, diags = rstep(
        state, voxmap, jnp.eye(3), jnp.zeros(3),
        sl(chunks, 0, nwarm), sl(scans, 0, nwarm), evicts[:nwarm],
        updates[:nwarm],
    )
    jax.block_until_ready(ts_w)
    it_counts = np.asarray(diags["icp_iterations"])
    print(f"icp iterations over {nwarm} warm scans: "
          f"mean={it_counts.mean():.1f} p50={np.percentile(it_counts,50):.0f} "
          f"max={it_counts.max()}")
    print("num_corr:", np.asarray(diags["num_correspondences"])[-5:])
    print("map voxels:", int(voxmap.num_voxels()))

    # representative single-scan inputs
    i = nwarm
    chunk = jax.tree.map(lambda x: x[i], chunks)
    scan = jax.tree.map(lambda x: x[i], scans)

    noise = eskf.make_noise_params(config)
    T_il = odo.lidar_extrinsics(config)

    # --- stage 1: predict ---
    predict = jax.jit(
        lambda s, c: eskf.predict_chunk_prefix(s, c, noise,
                                               base_mask=c.t_rel <= 0.0)
    )
    ms, (base, hist) = timeit(predict, state, chunk)
    print(f"predict_chunk_prefix: {ms:.2f} ms")

    # --- stage 2: preprocess ---
    prep = jax.jit(lambda s, h: preprocess.preprocess(s, h, T_il, config))
    ms, processed = timeit(prep, scan, hist)
    print(f"preprocess:           {ms:.2f} ms")

    # --- stage 2a: deskew only ---
    dsk = jax.jit(lambda s, h: preprocess.deskew(
        T_il.apply(s.points), s.t_rel, s.valid, h))
    ms, _ = timeit(dsk, scan, hist)
    print(f"  deskew only:        {ms:.2f} ms")

    # --- stage 3: align, varying max iterations ---
    guess = eskf.pose_of(base)
    for iters in (1, 2, 5, 10, 100):
        cfg_i = Config(**{**config.__dict__, "icp_max_iterations": iters})
        al = jax.jit(lambda p, m, g: registration.align(p, m, g, cfg_i))
        ms, res = timeit(al, processed, voxmap, guess)
        print(f"align(max_iter={iters:3d}):  {ms:.2f} ms "
              f"(ran {int(res.iterations)} iters, conv={bool(res.converged)}, "
              f"ncorr={int(res.num_correspondences)})")

    # --- stage 3a: one lookup ---
    lk = jax.jit(lambda m, p: vm.lookup(
        m, p, voxel_size=config.map_voxel_size,
        max_points_per_voxel=config.max_points_per_voxel))
    ms, _ = timeit(lk, voxmap, processed.points)
    print(f"  one map lookup:     {ms:.2f} ms")

    # --- stage 3b: normal equations only ---
    mu, covp, hit = lk(voxmap, processed.points)
    ne = jax.jit(lambda p, c, m, cm, msk: registration.normal_equations(
        p, c, m, cm, msk))
    ms, _ = timeit(ne, processed.points, processed.covs, mu,
                   vm.unpack_cov(covp), hit)
    print(f"  normal equations:   {ms:.2f} ms")

    # --- stage 4: insert ---
    ins = jax.jit(lambda m, p, c, v: vm.insert(
        m, p, c, v, voxel_size=config.map_voxel_size,
        max_points_per_voxel=config.max_points_per_voxel))
    ms, _ = timeit(ins, voxmap, processed.points,
                   vm.pack_cov(processed.covs), processed.valid)
    print(f"insert:               {ms:.2f} ms")

    # --- stage 5: evict ---
    ev = jax.jit(lambda m, c: vm.evict_beyond(
        m, c, voxel_size=config.map_voxel_size,
        distance_threshold=config.remove_distance_threshold,
        max_points_per_voxel=config.max_points_per_voxel))
    ms, _ = timeit(ev, voxmap, jnp.zeros(3))
    print(f"evict (periodic):     {ms:.2f} ms")

    # --- full step ---
    step = odo.make_scan_step(config)
    ms, _ = timeit(step, state, voxmap, prev_R, prev_t, chunk, scan,
                   jnp.asarray(False))
    print(f"FULL scan step:       {ms:.2f} ms")


if __name__ == "__main__":
    main()
