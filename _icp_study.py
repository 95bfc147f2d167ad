"""Per-iteration ICP behavior on hard scans: increment norms, correspondence
churn, convergence trajectory. Working tool."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration as reg
from eskf_lio_tpu.ops import lie, preprocess, voxel as vx
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

_HI = jax.lax.Precision.HIGHEST

config = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-3, rotation_noise=3e-4,
    max_raw_points=24576, max_scan_points=12288, max_imu_per_scan=64,
    hash_capacity_log2=19, scan_hash_capacity_log2=16, max_probe=32,
)
seq = dataset.make_synthetic_sequence(duration=13.0, points_per_scan=20000, seed=11)
init_scan, chunks, scans, evicts, _ = replay.pack_sequence(config, seq)
init_step = odo.make_init_step(config)
rstep = replay.make_replay_step(config)
state = eskf.init_state(config)
voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
voxmap, _ = init_step(voxmap, init_scan)
prev = (jnp.eye(3), jnp.zeros(3))
sl = lambda a, s, e: jax.tree.map(lambda x: x[s:e], a)

B = 100
out = rstep(state, voxmap, *prev, sl(chunks, 0, B), sl(scans, 0, B), evicts[:B])
state, voxmap = out[0], out[1]
prev = (out[2], out[3])
print("warmed to scan", B, "iters tail:",
      np.asarray(out[6]["icp_iterations"])[-8:], flush=True)

noise = eskf.make_noise_params(config)
T_il = odo.lidar_extrinsics(config)


@jax.jit
def study(state, voxmap, chunk, scan):
    base, hist = eskf.predict_chunk_prefix(
        state, chunk, noise, base_mask=chunk.t_rel <= 0.0
    )
    processed = preprocess.preprocess(scan, hist, T_il, config)
    guess = eskf.pose_of(base)

    def lookup_fn(pts):
        mu, cov_packed, hit = vm.lookup(
            voxmap, pts, voxel_size=config.map_voxel_size,
            max_points_per_voxel=config.max_points_per_voxel,
        )
        return mu, vm.unpack_cov(cov_packed), hit

    def body(carry, _):
        R_tot, t_tot, prev_keys = carry
        pts_w = lie.transform_points(R_tot, t_tot, processed.points)
        covs_w = jnp.einsum("ab,nbc,dc->nad", R_tot, processed.covs, R_tot,
                            precision=_HI)
        keys = vx.voxel_key(pts_w, config.map_voxel_size)
        churn = jnp.sum(jnp.logical_and(
            processed.valid, jnp.any(keys != prev_keys, axis=1)
        ).astype(jnp.int32))
        mu, cov_map, hit = lookup_fn(pts_w)
        mask = jnp.logical_and(processed.valid, hit)
        num_corr = jnp.sum(mask.astype(jnp.int32))
        JTJ, JTr = reg.normal_equations(pts_w, covs_w, mu, cov_map, mask)
        R_d, t_d = reg.solve_increment(JTJ, JTr, num_corr)
        R_new = jnp.einsum("ij,jk->ik", R_d, R_tot, precision=_HI)
        t_new = jnp.einsum("ij,j->i", R_d, t_tot, precision=_HI) + t_d
        cosine = 0.5 * (jnp.trace(R_d) - 1.0)
        # masked objective: mean squared Mahalanobis residual
        r = pts_w - mu
        W = reg.inv3x3_sym(covs_w + cov_map)
        obj = jnp.sum(jnp.einsum("ni,nij,nj->n", r, W, r)
                      * mask.astype(r.dtype)) / jnp.maximum(num_corr, 1)
        rec = (jnp.linalg.norm(t_d), cosine, churn, num_corr, obj)
        return (R_new, t_new, keys), rec

    init_keys = jnp.full((processed.points.shape[0], 3), -2**31, jnp.int32)
    (_, _, _), recs = jax.lax.scan(
        body, (guess.R, guess.t, init_keys), None, length=24
    )
    return recs


for target in (101, 108, 115):
    # advance the replay to just before `target`
    last = int(target)
    out = rstep(state, voxmap, *prev,
                sl(chunks, B, last), sl(scans, B, last), evicts[B:last])
    st2, vm2 = out[0], out[1]
    chunk = jax.tree.map(lambda x: x[last], chunks)
    scan = jax.tree.map(lambda x: x[last], scans)
    t_norm, cosv, churn, ncorr, obj = [np.asarray(x) for x in
                                       study(st2, vm2, chunk, scan)]
    print(f"\n== scan {last+1} ==", flush=True)
    for i in range(24):
        print(f"  it{i:2d}: |t_d|={t_norm[i]*1e3:8.3f} mm  cos={cosv[i]:.7f} "
              f"churn={churn[i]:5d}  ncorr={ncorr[i]:5d}  obj={obj[i]:.4f}")
