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


def profile_lookup(n: int = 32768) -> None:
    """Split the non-NE part of a GN iteration: transform+keys, view
    gather, payload gather+selects.  Cumulative variants inside one
    dispatch; differences give per-piece costs."""
    from eskf_lio_tpu.config import Config
    from eskf_lio_tpu.map import voxel_map as vm
    from eskf_lio_tpu.map.voxel_map import pack_cov
    from eskf_lio_tpu.ops import lie, sortmerge as sm
    from eskf_lio_tpu.ops import voxel as vx

    rng = np.random.default_rng(7)
    pts = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    A = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.05
    covs = A @ A.transpose(0, 2, 1) + 0.01 * np.eye(3, dtype=np.float32)
    cfg = Config(max_scan_points=n, hash_capacity_log2=19, map_delta_log2=14)
    voxmap = vm.VoxelMap.create(cfg.hash_capacity, cfg.map_delta_capacity)
    voxmap, _ = jax.jit(
        lambda m, p, c: vm.insert(
            m, p, c, jnp.ones(n, bool), voxel_size=cfg.map_voxel_size,
            max_points_per_voxel=cfg.max_points_per_voxel,
        )
    )(voxmap, jnp.asarray(pts), pack_cov(jnp.asarray(covs)))
    pts_j = jnp.asarray(pts)
    R0 = jnp.eye(3)
    t0_ = jnp.zeros(3)

    def variant(kind):
        def step(c, i):
            t = t0_ + c * 1e-9 + i * 1e-12
            pw = lie.transform_points(R0, t, pts_j)
            keys = vx.voxel_key(pw, cfg.map_voxel_size)
            packed, in_range = sm.pack_keys(keys, voxmap.origin)
            skey = sm.skey_of(packed)
            if kind == "keys":
                return c + jnp.sum(skey[:8].astype(jnp.float32)) * 1e-20, 0.0
            pay_raw, idx, _, found = vm._view_probe(voxmap.view, skey)
            if kind == "view":
                return c + jnp.sum(idx[:8].astype(jnp.float32)) * 1e-20, 0.0
            hit = jnp.logical_and(found, in_range)
            pay = jnp.where(hit[:, None], pay_raw, 0.0)
            return c + pay[0, 1] * 1e-20, 0.0
        return step

    KK = 1000
    for kind in ("keys", "view", "full"):
        @jax.jit
        def run(_k=kind):
            acc, _ = jax.lax.scan(
                variant(_k), jnp.zeros((), jnp.float32),
                jnp.arange(KK, dtype=jnp.float32),
            )
            return acc
        out = run()
        float(np.asarray(out))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run()
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "stage": f"lookup_{kind}", "n_points": n,
            "us_per_iter": round(best / KK * 1e6, 1),
        }))



def profile_gather(n: int = 32768) -> None:
    """Raw gather cost laws: element vs row gathers, row widths, table
    sizes — decides whether the view probe is latency- or bytes-bound."""
    rng = np.random.default_rng(0)
    KK = 1000
    C = 1 << 19

    def timeit_scan(make_body, label):
        @jax.jit
        def run():
            acc, _ = jax.lax.scan(
                make_body(), jnp.zeros((), jnp.float32),
                jnp.arange(KK, dtype=jnp.int32),
            )
            return acc
        out = run()
        float(np.asarray(out))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run()
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"stage": label, "n_points": n,
                          "us_per_iter": round(best / KK * 1e6, 1)}))

    idx0 = jnp.asarray(rng.integers(0, C, size=n, dtype=np.int32))

    # (a) element gather [N] <- [C]
    tab1 = jnp.asarray(rng.normal(size=C).astype(np.float32))
    def body_elem():
        def f(c, i):
            idx = (idx0 + i) % C
            g = tab1[idx]
            return c + g[0] * 1e-20, 0.0
        return f
    timeit_scan(body_elem, "gather_elem_1xf32")

    # (b) row gathers of widths 4/8/16 int32
    for w in (4, 8, 16):
        nb = C * 16 // (2 * w)  # same total entries as the 8-assoc view
        tab = jnp.asarray(rng.integers(0, 2**30, size=(nb, w), dtype=np.int32))
        idxb = jnp.asarray(rng.integers(0, nb, size=n, dtype=np.int32))
        def body_row(_tab=tab, _idxb=idxb, _nb=nb):
            def f(c, i):
                idx = (_idxb + i) % _nb
                rows = _tab[idx]
                return c + rows[0, 0].astype(jnp.float32) * 1e-20, 0.0
            return f
        timeit_scan(body_row, f"gather_row_{w}xi32")

    # (c) the [C,10] f32 payload row gather
    tabp = jnp.asarray(rng.normal(size=(C, 10)).astype(np.float32))
    def body_pay():
        def f(c, i):
            idx = (idx0 + i) % C
            rows = tabp[idx]
            return c + rows[0, 0] * 1e-20, 0.0
        return f
    timeit_scan(body_pay, "gather_row_10xf32")

    # (d) 10 separate 1-D gathers from [10, C] (transposed payload)
    tabt = jnp.asarray(rng.normal(size=(10, C)).astype(np.float32))
    def body_payT():
        def f(c, i):
            idx = (idx0 + i) % C
            rows = tabt[:, idx]
            return c + rows[0, 0] * 1e-20, 0.0
        return f
    timeit_scan(body_payT, "gather_cols_from_10xC")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stage"
    if mode == "parts":
        profile_parts(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "align":
        profile_align(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "lookup":
        profile_lookup(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "gather":
        profile_gather(int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif mode == "stage":
        main()
    else:
        main()
