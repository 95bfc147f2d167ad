"""Profile the replay step: device trace + diagnostics. Working tool."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

config = Config(
    imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
    translation_noise=1e-3, rotation_noise=3e-4,
    max_raw_points=24576, max_scan_points=12288, max_imu_per_scan=64,
    hash_capacity_log2=19, map_delta_log2=14, scan_hash_capacity_log2=16, max_probe=32,
)
seq = dataset.make_synthetic_sequence(duration=13.0, points_per_scan=20000, seed=11)
init_scan, chunks, scans, evicts, _ = replay.pack_sequence(config, seq)
init_step = odo.make_init_step(config)
rstep = replay.make_replay_step(config)
state = eskf.init_state(config)
voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
voxmap, _ = init_step(voxmap, init_scan)
prev_R, prev_t = jnp.eye(3), jnp.zeros(3)
sl = lambda a, s, e: jax.tree.map(lambda x: x[s:e], a)

B = 56
out = rstep(state, voxmap, prev_R, prev_t, sl(chunks, 0, B), sl(scans, 0, B), evicts[:B])
state, voxmap, prev_R, prev_t = out[0], out[1], out[2], out[3]
diags = out[6]
it = np.asarray(diags["icp_iterations"])
nc = np.asarray(diags["num_correspondences"])
ns = np.asarray(diags["num_scan_points"])
print(f"warm batch: iters mean={it.mean():.1f} max={it.max()} "
      f"ncorr last5={nc[-5:]} nscanpts last5={ns[-5:]}", flush=True)
print(f"map voxels: {int(voxmap.num_voxels())}", flush=True)
print(f"converged: {np.asarray(diags['icp_converged']).mean():.2%}", flush=True)

# timed + traced second batch
t0 = time.perf_counter()
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        out2 = rstep(state, voxmap, prev_R, prev_t,
                     sl(chunks, B, 2 * B), sl(scans, B, 2 * B), evicts[B:2 * B])
        float(np.asarray(out2[5][-1, 0]))
    print("trace captured", flush=True)
except Exception as e:
    print(f"trace failed: {type(e).__name__}: {e}", flush=True)
    out2 = rstep(state, voxmap, prev_R, prev_t,
                 sl(chunks, B, 2 * B), sl(scans, B, 2 * B), evicts[B:2 * B])
    float(np.asarray(out2[5][-1, 0]))
dt = time.perf_counter() - t0
print(f"second batch: {dt:.2f}s = {dt/B*1e3:.1f} ms/scan", flush=True)
d2 = out2[6]
it2 = np.asarray(d2["icp_iterations"])
print(f"second batch iters mean={it2.mean():.1f} max={it2.max()} "
      f"conv={np.asarray(d2['icp_converged']).mean():.2%}", flush=True)
