"""Probe: does the adaptive re-match `lax.cond` actually skip the bucket
gathers on TPU, and what does each align variant cost on a warm map?

Builds a warm heavy-shape map via a short replay, then times
`registration.align` in-graph (K iterations inside one dispatch, bench.py
stage discipline) for:
  exact      icp_rematch_threshold = 0      (lookup every GN iteration)
  adaptive   = 0.01                         (shipped default candidate)
  freeze     = 1e9                          (lookup ONLY on iteration 0 —
                                             upper bound on cond savings)
  every2     threshold 0, relookup_every=2  (round-4 blind knob datapoint)

If `freeze` is not markedly faster than `exact`, the cond is lowering to
something that still pays the gathers and the adaptive path is not worth
its ATE cost.  Run on the TPU from /root/repo.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from eskf_lio_tpu.io import dataset
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import eskf, registration
from eskf_lio_tpu.ops import preprocess
from eskf_lio_tpu.pipeline import odometry as odo
from eskf_lio_tpu.pipeline import replay


def main() -> None:
    cfg = bench.make_config(
        bench.HEAVY["max_raw_points"], bench.HEAVY["max_scan_points"]
    )
    seq = dataset.make_synthetic_sequence(
        duration=4.0,
        points_per_scan=bench.HEAVY["points_per_scan"],
        seed=11,
        imu_noise_gyro=4.9e-3, imu_noise_accel=0.0206,
        gyro_bias=np.array([0.002, -0.001, 0.0015]),
        accel_bias=np.array([0.02, -0.03, 0.01]),
    )
    init_scan, chunks, scans, evicts, updates, _ = replay.pack_sequence(
        cfg, seq
    )
    init_step = odo.make_init_step(cfg)
    replay_step = replay.make_replay_step(cfg)
    state = eskf.init_state(cfg)
    voxmap = vm.VoxelMap.create(cfg.hash_capacity, cfg.map_delta_capacity)
    voxmap, _ = init_step(voxmap, init_scan)
    state, voxmap, prev_R, prev_t, _, ts, _ = replay_step(
        state, voxmap, prev_R := jnp.eye(3), prev_t := jnp.zeros(3),
        chunks, scans, evicts, updates,
    )
    bench._sync(ts)
    print("warm map voxels:", int(voxmap.num_voxels()), flush=True)

    noise = eskf.make_noise_params(cfg)
    T_il = odo.lidar_extrinsics(cfg)
    chunk = jax.tree.map(lambda x: x[-1], chunks)
    scan = jax.tree.map(lambda x: x[-1], scans)
    base, hist = jax.jit(
        lambda s, c: eskf.predict_chunk_prefix(
            s, c, noise, base_mask=c.t_rel <= 0.0
        )
    )(state, chunk)
    processed = jax.jit(
        lambda s, h: preprocess.preprocess(s, h, T_il, cfg)
    )(scan, hist)
    guess = eskf.pose_of(base)

    variants = {
        "exact": dataclasses.replace(cfg, icp_rematch_threshold=0.0),
        "adaptive": dataclasses.replace(cfg, icp_rematch_threshold=0.01),
        "freeze": dataclasses.replace(cfg, icp_rematch_threshold=1e9),
        "every2": dataclasses.replace(
            cfg, icp_rematch_threshold=0.0, icp_relookup_every=2
        ),
    }
    K = 30
    for name, vcfg in variants.items():
        def make():
            def run():
                def body(c, _):
                    g2 = odo.Pose(guess.R, guess.t + c * 1e-12)
                    res = registration.align(processed, voxmap, g2, vcfg)
                    return res.pose.t[0], res.iterations
                _, o = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=K
                )
                return o
            return run

        fn = jax.jit(make())
        out = fn()
        bench._sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            bench._sync(out)
            best = min(best, time.perf_counter() - t0)
        res = registration.align(processed, voxmap, guess, vcfg)
        print(json.dumps({
            "variant": name,
            "align_ms": round(best / K * 1e3, 3),
            "iterations": int(res.iterations),
        }), flush=True)


if __name__ == "__main__":
    main()
