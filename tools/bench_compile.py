"""Compile-time + runtime cost model of the primitives the voxel pipeline
leans on, on the REAL backend (run plain: `python tools/bench_compile.py`).

Round-3 postmortem: this backend's XLA compile time scales super-linearly
with array size for `lax.sort` (and noticeably for scatters), and the
round-2/3 architecture used 13-15-operand variadic sorts at up to 655k
rows — hidden behind a committed `.jax_cache` in round 2, exposed cold in
round 3 (BENCH_r03 rc=124).  This script maps compile(N, op) so the
round-4 redesign can budget cold-compile explicitly.

Prints one line per case: name, N, compile seconds, warm µs/iter.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def case(name, n, build, k_iters=50):
    """build(n) -> (fn, args). Times jit compile and warm per-iter runtime
    (k_iters chained inside one dispatch via a scan carry)."""
    fn, args = build(n)

    def scanned(*a):
        def body(c, _):
            out = fn(*a, c)
            return out, ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_iters)
        return out

    t0 = time.perf_counter()
    compiled = jax.jit(scanned).lower(*args).compile()
    t_c = time.perf_counter() - t0
    out = compiled(*args)
    _sync(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = compiled(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    print(
        f"{name:24s} N={n:>8d}  compile {t_c:8.2f}s   warm {best / k_iters * 1e6:9.1f} us/iter",
        flush=True,
    )


def sort_k(k):
    def build(n):
        key = jnp.arange(n, dtype=jnp.int32)[::-1]
        cols = [jnp.zeros((n,), jnp.int32) for _ in range(k - 1)]

        def fn(key, *rest):
            c = rest[-1]
            cols = rest[:-1]
            out = jax.lax.sort(
                (key + c.astype(jnp.int32),) + cols, num_keys=1, is_stable=True
            )
            return out[0][0].astype(jnp.float32)

        return fn, (key, *cols)

    return build


def gather_rows(w):
    def build(n):
        tbl = jnp.zeros((n, w), jnp.float32)
        idx = jnp.arange(n, dtype=jnp.int32)[::-1]

        def fn(tbl, idx, c):
            rows = tbl[idx + c.astype(jnp.int32)]
            return rows[0, 0] + c

        return fn, (tbl, idx)

    return build


def scatter_rows(w):
    def build(n):
        tbl = jnp.zeros((n, w), jnp.float32)
        idx = jnp.arange(n, dtype=jnp.int32)[::-1]
        rows = jnp.ones((n, w), jnp.float32)

        def fn(tbl, idx, rows, c):
            out = tbl.at[idx].set(rows + c)
            return out[0, 0]

        return fn, (tbl, idx, rows)

    return build


def scatter_2d():
    """The `_scatter_slots` pattern: [E,12] scalars into [E/2, 128]."""

    def build(n):
        view = jnp.zeros((n // 2, 128), jnp.int32)
        b = jnp.arange(n, dtype=jnp.int32) % (n // 2)
        slot = jnp.zeros((n,), jnp.int32)
        vals = jnp.ones((n, 12), jnp.int32)

        def fn(view, b, slot, vals, c):
            cols = slot[:, None] * 16 + jnp.arange(12, dtype=jnp.int32)
            out = view.at[b[:, None] + c.astype(jnp.int32), cols].set(
                vals, mode="drop"
            )
            return out[0, 0].astype(jnp.float32)

        return fn, (view, b, slot, vals)

    return build


def cumsum():
    def build(n):
        x = jnp.ones((n,), jnp.int32)

        def fn(x, c):
            return jnp.cumsum(x + c.astype(jnp.int32))[-1].astype(jnp.float32)

        return fn, (x,)

    return build


def searchsorted(q):
    def build(n):
        tbl = jnp.arange(n, dtype=jnp.int32)
        qs = jnp.arange(q, dtype=jnp.int32) * (n // q)

        def fn(tbl, qs, c):
            idx = jnp.searchsorted(tbl, qs + c.astype(jnp.int32))
            return idx[0].astype(jnp.float32)

        return fn, (tbl, qs)

    return build


CASES = [
    # (name, n, build)
    ("sort2", 32768, sort_k(2)),
    ("sort3", 32768, sort_k(3)),
    ("sort5", 32768, sort_k(5)),
    ("sort13", 32768, sort_k(13)),
    ("sort2", 131072, sort_k(2)),
    ("sort3", 131072, sort_k(3)),
    ("gather16", 131072, gather_rows(16)),
    ("gather16", 524288, gather_rows(16)),
    ("scatter_rows10", 131072, scatter_rows(10)),
    ("scatter_rows10", 524288, scatter_rows(10)),
    ("scatter2d_slots", 131072, scatter_2d()),
    ("scatter2d_slots", 524288, scatter_2d()),
    ("cumsum", 524288, cumsum()),
    ("searchsorted32k", 524288, searchsorted(32768)),
    ("sort2", 524288, sort_k(2)),
    ("sort3", 524288, sort_k(3)),
]

if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    print(f"backend: {jax.default_backend()}", flush=True)
    for name, n, build in CASES:
        if only and only not in name:
            continue
        case(name, n, build)
