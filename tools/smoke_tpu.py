"""On-TPU smoke gate: compile + run the real-chip hot paths at the SHIPPED
capacities from a cold-ish cache, inside a hard wall-clock budget.

Round-3 regression postmortem: a voxel-map rewrite landed without any
on-chip compile check and the driver bench timed out (BENCH_r03 rc=124).
This gate makes the cold compile cost of every per-scan program an
explicit, asserted number.  Run BEFORE COMMITTING any change that touches
the jitted pipeline:

    python tools/smoke_tpu.py            # shipped heavy shapes
    ESKF_SMOKE_BUDGET_S=600 python tools/smoke_tpu.py

Prints per-program compile+run seconds and FAILS (exit 1) if the total
exceeds the budget (default 420 s) so a compile-time explosion can never
again reach a commit silently.  Uses a THROWAWAY compilation cache dir so
the numbers are honest cold numbers.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honest cold-compile numbers: never read the repo's warm .jax_cache
jax.config.update(
    "jax_compilation_cache_dir", tempfile.mkdtemp(prefix="eskf_smoke_cache_")
)

import jax.numpy as jnp
import numpy as np

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay

BUDGET_S = float(os.environ.get("ESKF_SMOKE_BUDGET_S", "420"))


def _sync(out) -> None:
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def main() -> int:
    t_start = time.perf_counter()
    config = Config(
        imu=ImuConfig(gravity=(0.0, 0.0, -9.81)),
        max_raw_points=131072,
        max_scan_points=32768,
        max_imu_per_scan=64,
        hash_capacity_log2=19,
    )
    seq = dataset.make_synthetic_sequence(
        duration=1.6, points_per_scan=120000, seed=3
    )
    init_scan, chunks, scans, evicts, updates, _ = replay.pack_sequence(
        config, seq
    )

    marks = []

    def step(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        dt = time.perf_counter() - t0
        marks.append((name, dt))
        print(f"  {name:12s} {dt:7.1f}s (compile+first run)", flush=True)
        return out

    state = eskf.init_state(config)
    voxmap = vm.VoxelMap.create(
        config.hash_capacity, config.map_delta_capacity
    )
    init_step = odo.make_init_step(config)
    voxmap, _ = step("init", init_step, voxmap, init_scan)

    replay_step = replay.make_replay_step(config)
    sl = lambda a: jax.tree.map(lambda x: x[:4], a)
    out = step(
        "replay(4)", replay_step,
        state, voxmap, jnp.eye(3), jnp.zeros(3),
        sl(chunks), sl(scans), evicts[:4], updates[:4],
    )
    state2, voxmap2 = out[0], out[1]
    conv = np.asarray(out[6]["icp_converged"])
    n_vox = int(voxmap2.num_voxels())
    p = np.asarray(state2.p)

    total = time.perf_counter() - t_start
    ok = total <= BUDGET_S and np.isfinite(p).all() and n_vox > 0
    print(
        f"smoke: total {total:.1f}s (budget {BUDGET_S:.0f}s), "
        f"voxels {n_vox}, icp_converged {conv.tolist()}, "
        f"{'OK' if ok else 'FAIL'}",
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
