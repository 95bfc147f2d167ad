"""Bisect the XLA compile-time explosion in the voxel-map compaction path.

Round-3 finding (VERDICT.md Weak #1): fresh compile of `_compact_into_main`
takes 495 s at C=4096 on the real chip; `insert` at the shipped 2^19 never
finished.  This script times `jit(...).lower().compile()` of the individual
pieces at a given capacity so the culprit op can be isolated, on whatever
backend it is launched with (CPU first — if the blow-up reproduces there,
iterate there).

Usage:  JAX_PLATFORMS=cpu python tools/compile_bisect.py [C_log2 ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from eskf_lio_tpu.map import voxel_map as vm  # noqa: E402


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(
        f"  {name:28s} trace {t1 - t0:7.2f}s  compile {t2 - t1:7.2f}s",
        flush=True,
    )
    return compiled


def run(c_log2: int) -> None:
    c = 1 << c_log2
    d = max(c // 8, 1024)
    print(f"C = 2^{c_log2} = {c}  (delta {d})", flush=True)
    m = vm.VoxelMap.create(c)
    cap = jnp.float32(1000.0)

    skey = jnp.zeros((d,), jnp.int32)
    payload = jnp.zeros((d, 10), jnp.float32)

    # 1. the slot scatter alone (suspect A)
    def scatter_only(view, b, slot, vals, ok):
        return vm._scatter_slots(view, b, slot, vals, ok)

    b = jnp.zeros((d,), jnp.int32)
    slot = jnp.zeros((d,), jnp.int32)
    vals = jnp.zeros((d, vm.VIEW_SLOT), jnp.int32)
    okm = jnp.ones((d,), bool)
    timed_compile("scatter_slots[D]", scatter_only, m.d_view, b, slot, vals, okm)

    # 2. build_view alone at main capacity (scatter at E=C)
    def bv(sk, pay):
        return vm._build_view(sk, pay)

    timed_compile("build_view[C]", bv, m.skey, m.payload)

    # 3. the (key, iota) sort + payload gather at C+D rows
    from eskf_lio_tpu.ops import sortmerge as smod

    def sort2(sk, pay):
        return smod.sort_perm(sk, pay)

    n = c + d
    timed_compile(
        "sort_perm[C+D]",
        sort2,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 10), jnp.float32),
    )

    # 4. full fold
    def comp(mm, sk, pay):
        return vm._fold_into_main(mm, sk, pay, cap)

    timed_compile("fold_into_main", comp, m, skey, payload)

    # 5. full insert (embeds compaction under lax.cond)
    pts = jnp.zeros((2048, 3), jnp.float32)
    covs = jnp.zeros((2048, 6), jnp.float32)
    val = jnp.ones((2048,), bool)

    def ins(mm, p, cv, v):
        return vm.insert(
            mm, p, cv, v, voxel_size=0.3, max_points_per_voxel=1000
        )

    timed_compile("insert", ins, m, pts, covs, val)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [12]
    print(f"backend: {jax.default_backend()}", flush=True)
    for cl in args:
        run(cl)
