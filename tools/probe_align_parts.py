"""Decompose the per-iteration cost of the GN loop body on TPU.

The adaptive probe implied ~1.28 ms/iter of NON-lookup cost in align
(lookup itself only ~0.59 ms).  This times each candidate in-graph:
6x6 jnp.linalg.solve vs an unrolled Cholesky, se3_exp, transform_points,
a single view probe, the pallas GN stage, and the f64<->f32 boundary.
Run on TPU from /root/repo.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from eskf_lio_tpu.map import voxel_map as vm
from eskf_lio_tpu.models import registration
from eskf_lio_tpu.ops import lie


_BASELINE_S: dict[int, float] = {}


def _dispatch_baseline(k: int) -> float:
    """Total seconds of an empty K-iteration scan dispatch (tunnel
    dispatch ~30 ms + scan overhead) — subtracted from every measurement
    so per-iter numbers are not floored at 30ms/K."""
    if k not in _BASELINE_S:
        def run():
            def body(c, _):
                return c + 1e-12, c
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        fn = jax.jit(run)
        out = fn()
        bench._sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            bench._sync(out)
            best = min(best, time.perf_counter() - t0)
        _BASELINE_S[k] = best
    return _BASELINE_S[k]


def timeit(name, make_scanned, k):
    base = _dispatch_baseline(k)
    fn = jax.jit(make_scanned(k))
    out = fn()
    bench._sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        bench._sync(out)
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "op": name,
                "ms": round(max(best - base, 0.0) / k * 1e3, 4),
                "raw_ms": round(best / k * 1e3, 4),
                "k": k,
            }
        ),
        flush=True,
    )


def chol6_solve(A, b):
    """Unrolled 6x6 Cholesky solve (A SPD).  Pure fused ALU, no LAPACK
    fallback."""
    L = jnp.zeros_like(A)
    for j in range(6):
        d = A[j, j] - jnp.sum(L[j, :j] ** 2)
        dj = jnp.sqrt(jnp.maximum(d, 1e-30))
        L = L.at[j, j].set(dj)
        for i in range(j + 1, 6):
            v = A[i, j] - jnp.sum(L[i, :j] * L[j, :j])
            L = L.at[i, j].set(v / dj)
    y = jnp.zeros(6, A.dtype)
    for i in range(6):
        y = y.at[i].set((b[i] - jnp.sum(L[i, :i] * y[:i])) / L[i, i])
    x = jnp.zeros(6, A.dtype)
    for i in reversed(range(6)):
        x = x.at[i].set((y[i] - jnp.sum(L[i + 1 :, i] * x[i + 1 :])) / L[i, i])
    return x


def main():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((6, 6)).astype(np.float32)
    A0 = jnp.asarray(M @ M.T + 6 * np.eye(6, dtype=np.float32))
    b0 = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    n = 32768
    pts = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    R0 = jnp.eye(3)
    t0v = jnp.zeros(3)

    K = 200

    def mk_linalg(k):
        def run():
            def body(c, _):
                x = jnp.linalg.solve(A0 + c * 1e-12, b0)
                return x[0], x[0]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    def mk_chol(k):
        def run():
            def body(c, _):
                x = chol6_solve(A0 + c * 1e-12, b0)
                return x[0], x[0]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    def mk_se3exp(k):
        def run():
            def body(c, _):
                R, t = lie.se3_exp(b0 * (1e-6 + c * 1e-18))
                return R[0, 0], t[0]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    def mk_transform(k):
        def run():
            def body(c, _):
                w = lie.transform_points(R0, t0v + c * 1e-12, pts)
                return w[0, 0], w[0, 1]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    K = 2000
    timeit("linalg_solve6", mk_linalg, K)
    timeit("chol6_unrolled", mk_chol, K)
    timeit("se3_exp", mk_se3exp, K)
    timeit("transform_points_32k", mk_transform, 500)

    # view probe on a realistic warm map
    cfg = bench.make_config(131072, 32768)
    voxmap = vm.VoxelMap.create(cfg.hash_capacity, cfg.map_delta_capacity)
    covs = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 0.01, (n, 1, 1))
    voxmap, _ = vm.insert(
        voxmap, pts * 3.0, vm.pack_cov(covs), jnp.ones((n,), bool),
        voxel_size=0.3, max_points_per_voxel=1000,
    )
    voxmap, _ = vm.compact(voxmap, max_points_per_voxel=1000)

    def mk_lookup(k):
        def run():
            def body(c, _):
                mu, cp, hit = vm.lookup(
                    voxmap, pts * 3.0 + c * 1e-12, voxel_size=0.3,
                    max_points_per_voxel=1000,
                )
                return mu[0, 0], hit[0]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    timeit("lookup_two_tier_32k", mk_lookup, 300)

    # pallas GN stage
    from eskf_lio_tpu.ops import gn_pallas

    mu = pts * 3.0
    cp = vm.pack_cov(covs)
    mask = jnp.ones((n,), bool)

    def mk_gn(k):
        def run():
            def body(c, _):
                JTJ, JTr = gn_pallas.normal_equations_pallas_rotated(
                    pts * 3.0 + c * 1e-12, cp, R0, mu, cp, mask
                )
                return JTJ[0, 0], JTr[0]
            _, o = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return o
        return run

    timeit("gn_pallas_32k", mk_gn, 300)


if __name__ == "__main__":
    main()
