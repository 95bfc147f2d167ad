"""Quantify the sharding overhead: mesh(1) sharded step vs the plain
single-device step on the real chip.

With one device the sharded path pays the full machinery — owner-candidate
mask, slice compaction sort, shard_map + (no-op) psums — but gets no
parallel speedup, so mesh(1)-vs-unsharded is exactly the overhead a
multi-chip deployment must amortise (VERDICT r2 item 1 done-criterion).

K step iterations run inside one dispatch (carry = (state, map, pose));
sync by scalar fetch.  Usage: python tools/bench_shard.py [K]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        translation_noise=1e-3,
        rotation_noise=3e-4,
        max_raw_points=131072,
        max_scan_points=32768,
        max_imu_per_scan=64,
        hash_capacity_log2=19,
    )
    seq = dataset.make_synthetic_sequence(
        duration=13.0, points_per_scan=120000, seed=11
    )
    init_scan, chunks, scans, evicts, updates, _ = replay.pack_sequence(
        config, seq
    )
    init_step = odo.make_init_step(config)
    rstep = replay.make_replay_step(config)
    state = eskf.init_state(config)
    voxmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)
    voxmap, _ = init_step(voxmap, init_scan)
    nwarm = 40
    sl = lambda a: jax.tree.map(lambda x: x[:nwarm], a)
    state, voxmap, prev_R, prev_t, _, ts_w, _ = rstep(
        state, voxmap, jnp.eye(3), jnp.zeros(3),
        sl(chunks), sl(scans), evicts[:nwarm], updates[:nwarm],
    )
    float(np.asarray(ts_w[-1, 0]))
    chunk = jax.tree.map(lambda x: x[nwarm], chunks)
    scan = jax.tree.map(lambda x: x[nwarm], scans)

    def timed(core, carry, label):
        @jax.jit
        def run(carry):
            def body(c, _):
                c2, diag = core(c, (chunk, scan, jnp.asarray(False)))
                return c2, diag["num_correspondences"]
            _, out = jax.lax.scan(body, carry, None, length=k)
            return out
        out = run(carry)
        float(np.asarray(out[-1]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(carry)
            float(np.asarray(out[-1]))
            best = min(best, time.perf_counter() - t0)
        ms = best / k * 1e3
        print(json.dumps({"stage": label, "ms_per_scan": round(ms, 3)}))
        return ms

    carry = (state, voxmap, prev_R, prev_t)
    plain = odo.make_step_core(config)
    ms_plain = timed(plain, carry, "plain_step")

    # mesh(1) sharded core: same carry, shard_map over a 1-device mesh
    from jax.sharding import Mesh
    from eskf_lio_tpu.parallel import sharded_map as sh

    mesh = Mesh(np.asarray(jax.devices()[:1]), (config.mesh_axis_name,))
    sharded_full = sh.make_sharded_scan_step(config, mesh)

    @jax.jit
    def sharded_core(c, inputs):
        st, m, R, t = c
        ch, sc, ev = inputs
        st, m, R, t, diag = sharded_full(st, m, R, t, ch, sc, ev)
        return (st, m, R, t), diag

    ms_shard = timed(sharded_core, carry, "sharded_step_mesh1")
    print(json.dumps({
        "stage": "sharding_overhead",
        "overhead_pct": round((ms_shard / ms_plain - 1.0) * 100.0, 1),
    }))


if __name__ == "__main__":
    main()
