"""Head-to-head: fused Pallas GN kernel vs the XLA einsum path.

Measures the VGICP normal-equations stage — the reference's hottest loop
(`/root/reference/src/Registration.cpp:60-102`) — both as an isolated stage
and inside the full `align()` GN iteration, on the real chip at bench
shapes.  K iterations run inside ONE dispatch (lax.scan with per-iteration
input perturbation so nothing hoists); sync by scalar fetch (axon acks lie).

Usage:  python tools/bench_gn.py [N]        # default N=32768
Output: one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from eskf_lio_tpu.models import registration as reg
from eskf_lio_tpu.ops import gn_pallas

K = 1000  # GN-stage iterations per dispatch (amortises the ~30 ms
# per-dispatch tunnel overhead to ~30 us/iter)


def make_inputs(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 10.0
    A = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.1
    covs = A @ A.transpose(0, 2, 1) + 0.01 * np.eye(3, dtype=np.float32)
    B = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.1
    covm = B @ B.transpose(0, 2, 1) + 0.01 * np.eye(3, dtype=np.float32)
    mu = pts + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    mask = rng.random(n) < 0.9
    return (
        jnp.asarray(pts), jnp.asarray(covs), jnp.asarray(mu),
        jnp.asarray(covm), jnp.asarray(mask),
    )


def time_stage(fn, inputs, label: str, n: int) -> float:
    pts, covs, mu, covm, mask = inputs

    @jax.jit
    def run(pts, covs, mu, covm, mask):
        def body(carry, i):
            # perturb the points per iteration so the K stages can't be CSE'd
            p = pts + carry[0, 0] * 1e-6 + i.astype(pts.dtype) * 1e-7
            JTJ, JTr = fn(p, covs, mu, covm, mask)
            return carry + JTJ, JTr

        acc, _ = jax.lax.scan(
            body, jnp.zeros((6, 6), pts.dtype), jnp.arange(K)
        )
        return acc

    out = run(pts, covs, mu, covm, mask)
    float(np.asarray(out)[0, 0])  # warmup sync
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(pts, covs, mu, covm, mask)
        float(np.asarray(out)[0, 0])
        best = min(best, time.perf_counter() - t0)
    us_per_iter = best / K * 1e6
    print(json.dumps({
        "stage": label, "n_points": n, "us_per_gn_iter": round(us_per_iter, 1),
        "gb_per_s": round(4 * 19 * n / (best / K) / 1e9, 1),
    }))
    return us_per_iter


def main() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    inputs = make_inputs(n)
    t_einsum = time_stage(reg.normal_equations, inputs, "einsum", n)
    t_pallas = time_stage(
        lambda *a: gn_pallas.normal_equations_pallas(*a), inputs, "pallas", n
    )
    print(json.dumps({
        "stage": "speedup_pallas_vs_einsum",
        "n_points": n,
        "value": round(t_einsum / t_pallas, 2),
    }))


def profile_parts(n: int = 32768) -> None:
    """Where does the time go: operand pack vs kernel proper, block sweep."""
    from eskf_lio_tpu.map.voxel_map import pack_cov

    inputs = make_inputs(n)
    pts, covs, mu, covm, mask = inputs
    covp, covmp = pack_cov(covs), pack_cov(covm)

    @jax.jit
    def pack_only(pts, covp, mu, covmp, mask):
        def body(carry, i):
            p = pts + carry * 1e-6 + i.astype(pts.dtype) * 1e-7
            x = gn_pallas.pack_operand(p, covp, mu, covmp, mask)
            return carry + x[0, 0], x[0, 0]
        acc, _ = jax.lax.scan(body, jnp.zeros((), pts.dtype), jnp.arange(K))
        return acc

    out = pack_only(pts, covp, mu, covmp, mask)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = pack_only(pts, covp, mu, covmp, mask)
    float(np.asarray(out))
    print(json.dumps({"stage": "pack_only", "n_points": n,
                      "us_per_iter": round((time.perf_counter() - t0) / K * 1e6, 1)}))

    x0 = gn_pallas.pack_operand(pts, covp, mu, covmp, mask)
    for blk in (1024, 2048, 4096, 8192, 16384, n):
        @jax.jit
        def kernel_only(x, _blk=blk):
            def body(carry, i):
                xi = x.at[0, 0].add(carry * 1e-6 + i.astype(x.dtype) * 1e-7)
                s = gn_pallas._gn_call(
                    jnp.eye(3).reshape(9), xi, interpret=False, block=_blk
                )
                return carry + s[0], s[0]
            acc, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), jnp.arange(K))
            return acc
        out = kernel_only(x0)
        float(np.asarray(out))
        t0 = time.perf_counter()
        out = kernel_only(x0)
        float(np.asarray(out))
        print(json.dumps({"stage": f"kernel_only_blk{blk}", "n_points": n,
                          "us_per_iter": round((time.perf_counter() - t0) / K * 1e6, 1)}))




def profile_align(n: int = 32768, iters: int = 10) -> None:
    """Full align() head-to-head at a fixed GN iteration count (convergence
    disabled) on a realistic warm map, einsum vs pallas."""
    import dataclasses

    from eskf_lio_tpu.config import Config
    from eskf_lio_tpu.map import voxel_map as vm
    from eskf_lio_tpu.map.voxel_map import pack_cov
    from eskf_lio_tpu.ops import lie
    from eskf_lio_tpu.types import Pose, ProcessedScan

    rng = np.random.default_rng(7)
    pts = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    A = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.05
    covs = A @ A.transpose(0, 2, 1) + 0.01 * np.eye(3, dtype=np.float32)

    base = Config(
        max_scan_points=n, hash_capacity_log2=19, map_delta_log2=14,
        icp_max_iterations=iters, icp_cosine_threshold=2.0,  # never converge
    )
    voxmap = vm.VoxelMap.create(base.hash_capacity, base.map_delta_capacity)
    voxmap, _ = jax.jit(
        lambda m, p, c: vm.insert(
            m, p, c, jnp.ones(n, bool), voxel_size=base.map_voxel_size,
            max_points_per_voxel=base.max_points_per_voxel,
        )
    )(voxmap, jnp.asarray(pts), pack_cov(jnp.asarray(covs)))

    xi = jnp.asarray([0.02, -0.03, 0.01, 0.004, -0.002, 0.003], jnp.float32)
    R0, t0_ = lie.se3_exp(xi)
    scan = ProcessedScan(
        points=jnp.asarray(pts) @ np.asarray(R0).T + np.asarray(t0_),
        covs=jnp.asarray(covs),
        valid=jnp.ones(n, bool),
    )
    guess = Pose(jnp.eye(3), jnp.zeros(3))

    results = {}
    for backend in ("einsum", "pallas"):
        cfg = dataclasses.replace(base, gn_backend=backend)
        from eskf_lio_tpu.models import registration as reg_mod

        REPS = 20

        @jax.jit
        def al(p, m, g, _c=cfg):
            def body(carry, i):
                # nudge the guess per rep so aligns can't be CSE'd
                g2 = reg_mod.Pose(g.R, g.t + carry * 1e-9 + i * 1e-12)
                r = reg_mod.align(p, m, g2, _c)
                return carry + r.pose.t[0], r
            _, rs = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(REPS, dtype=jnp.float32))
            return jax.tree.map(lambda x: x[-1], rs)

        res = al(scan, voxmap, guess)
        float(np.asarray(res.pose.t)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = al(scan, voxmap, guess)
            float(np.asarray(res.pose.t)[0])
            best = min(best, time.perf_counter() - t0)
        us = best / (iters * REPS) * 1e6
        results[backend] = us
        print(json.dumps({
            "stage": f"align_{backend}", "n_points": n,
            "us_per_gn_iter": round(us, 1),
            "t_err": round(float(np.abs(np.asarray(res.pose.t) - np.asarray(t0_)).max()), 6),
        }))
    print(json.dumps({
        "stage": "align_speedup_pallas_vs_einsum", "n_points": n,
        "value": round(results["einsum"] / results["pallas"], 2),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stage"
    if mode == "parts":
        profile_parts(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "align":
        profile_align(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "stage":
        main()
    else:
        main()
