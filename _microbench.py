"""Microbenchmarks of TPU primitive costs, v2.

The axon tunnel adds ~6 ms per dispatch, so per-call timing is useless.
Each op is measured as K iterations inside ONE on-device fori_loop with a
data dependence between iterations, then one scalar fetch; an empty-loop
baseline is subtracted.  Working tool, not framework code."""

import time
import functools

print = functools.partial(print, flush=True)
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 50


def mix32(x):
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def bench(name, body, init_carry, k=K):
    """body(i, carry) -> carry; time K reps in one dispatch."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, k, body, c)

    out = run(init_carry)  # compile+warm
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = run(init_carry)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) * 1e3
    per = (dt - BASELINE) / k
    print(f"{name:44s} {per:8.3f} ms/op   (dispatch {dt:.1f} ms)")
    return per


rng = np.random.default_rng(0)

# baseline: empty loop
@jax.jit
def _empty(c):
    return jax.lax.fori_loop(0, K, lambda i, x: x + 1.0, c)


_ = _empty(jnp.zeros(()))
float(np.asarray(_))
t0 = time.perf_counter()
_ = _empty(jnp.zeros(()))
float(np.asarray(_))
BASELINE = (time.perf_counter() - t0) * 1e3
print(f"baseline dispatch+empty loop: {BASELINE:.2f} ms")

# --- sorts ---
for n in (16384, 32768, 131072, 524288):
    x0 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    bench(
        f"sort int32 [{n}]",
        lambda i, x: jnp.sort(mix32(x).astype(jnp.int32)),
        x0,
    )

n = 81920
x0 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
p0 = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))


def argsort_gather(i, c):
    x, p = c
    o = jnp.argsort(mix32(x).astype(jnp.int32))
    return x[o], p[o]


bench(f"argsort+key-gather+pay10-gather [{n}]", argsort_gather, (x0, p0))


def vsort(i, c):
    x, p = c
    cols = jax.lax.sort(
        (mix32(x).astype(jnp.int32),) + tuple(p[:, j] for j in range(10)),
        num_keys=1,
    )
    return cols[0], jnp.stack(cols[1:], axis=1)


bench(f"variadic sort 1key+10pay [{n}]", vsort, (x0, p0))

# --- gathers ---
C = 524288
tab1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
tab10 = jnp.asarray(rng.normal(size=(C, 10)).astype(np.float32))
idx0 = jnp.asarray(rng.integers(0, C, 16384, dtype=np.int32))


def g1(i, c):
    idx, acc = c
    v = tab1[idx]
    idx = (mix32(idx) & jnp.uint32(C - 1)).astype(jnp.int32)
    return idx, acc + v


bench(f"gather [16384] from [{C}] f32", g1, (idx0, jnp.zeros(16384)))


def g10(i, c):
    idx, acc = c
    v = tab10[idx]
    idx = (mix32(idx) & jnp.uint32(C - 1)).astype(jnp.int32)
    return idx, acc + v[:, 0]


bench(f"row-gather [16384,10] from [{C},10]", g10, (idx0, jnp.zeros(16384)))

idxb0 = jnp.asarray(rng.integers(0, C, 65536, dtype=np.int32))
bench(
    f"gather [65536] from [{C}] f32",
    lambda i, c: (
        (mix32(c[0]) & jnp.uint32(C - 1)).astype(jnp.int32),
        c[1] + tab1[c[0]],
    ),
    (idxb0, jnp.zeros(65536)),
)

# --- searchsorted / bucketed lookup ---
skeys = jnp.sort(jnp.asarray(rng.integers(0, 1 << 31, C, dtype=np.int32)))
q0 = jnp.asarray(rng.integers(0, 1 << 31, 16384, dtype=np.int32))


def ss(i, c):
    q, acc = c
    r = jnp.searchsorted(skeys, q).astype(jnp.int32)
    q = (mix32(q) >> jnp.uint32(1)).astype(jnp.int32)
    return q, acc + r


bench(f"searchsorted [{C}] q=16384", ss, (q0, jnp.zeros(16384, jnp.int32)))

small = jnp.sort(jnp.asarray(rng.integers(0, 1 << 31, 65536, dtype=np.int32)))


def ss_small(i, c):
    q, acc = c
    r = jnp.searchsorted(small, q).astype(jnp.int32)
    q = (mix32(q) >> jnp.uint32(1)).astype(jnp.int32)
    return q, acc + r


bench("searchsorted [65536] q=16384", ss_small, (q0, jnp.zeros(16384, jnp.int32)))

BB = 8192
bucket_of = jnp.right_shift(skeys, 31 - 13).astype(jnp.int32)  # skey in [0,2^31)
starts = jnp.searchsorted(bucket_of, jnp.arange(BB, dtype=jnp.int32)).astype(
    jnp.int32
)


def bucket_lookup(i, c):
    q, acc = c
    b = jnp.right_shift(q, 31 - 13).astype(jnp.int32)
    idx = starts[b] - 1
    w = 256
    while w >= 1:
        cand = idx + w
        ok = jnp.logical_and(cand < C, skeys[jnp.minimum(cand, C - 1)] <= q)
        idx = jnp.where(ok, cand, idx)
        w //= 2
    q = (mix32(q) >> jnp.uint32(1)).astype(jnp.int32)
    return q, acc + idx


bench("bucketed lookup (2+9 rounds) q=16384", bucket_lookup,
      (q0, jnp.zeros(16384, jnp.int32)))

# --- segment ops ---
n = 32768
seg = jnp.sort(jnp.asarray(rng.integers(0, n, n, dtype=np.int32)))
v0 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
bench(
    f"segment_sum [{n}] -> [{n}]",
    lambda i, c: jax.ops.segment_sum(c + 1.0, seg, num_segments=n),
    v0,
)
v10 = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
bench(
    f"segment_sum [{n},10]",
    lambda i, c: jax.ops.segment_sum(c + 1.0, seg, num_segments=n),
    v10,
)
bench(f"cumsum [{n},10]", lambda i, c: jnp.cumsum(c, axis=0) * 1e-3, v10)
idxp = jnp.asarray(rng.permutation(n).astype(np.int32))
bench(
    f"scatter-add perm [{n}]",
    lambda i, c: jnp.zeros((n,), jnp.float32).at[idxp].add(c),
    v0,
)
bench(
    f"scatter-rows perm [{n},10]",
    lambda i, c: jnp.zeros((n, 10), jnp.float32).at[idxp].add(c),
    v10,
)

# --- assoc scans / prefix ---
m64 = jnp.asarray(rng.normal(size=(64, 18, 18)).astype(np.float32) * 0.1)
bench(
    "assoc_scan matmul [64,18,18]",
    lambda i, c: jax.lax.associative_scan(
        lambda a, b: jnp.einsum("mij,mjk->mik", a, b,
                                precision=jax.lax.Precision.HIGHEST),
        c,
    )
    * 0.99,
    m64,
)

# --- einsum NE ---
N = 16384
J = jnp.asarray(rng.normal(size=(N, 3, 6)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(N, 3, 3)).astype(np.float32))
r = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))


def ne(i, c):
    Wl = W * (1.0 + c * 1e-9)
    WJ = jnp.einsum("nij,njk->nik", Wl, J,
                    precision=jax.lax.Precision.HIGHEST)
    JTJ = jnp.einsum("nia,nib->ab", J, WJ,
                     precision=jax.lax.Precision.HIGHEST)
    JTr = jnp.einsum("nia,nij,nj->a", J, Wl, r,
                     precision=jax.lax.Precision.HIGHEST)
    return c + JTJ[0, 0] + JTr[0]


bench(f"normal equations N={N} f32-highest", ne, jnp.zeros(()))


def ne_bf16(i, c):
    Wl = W * (1.0 + c * 1e-9)
    WJ = jnp.einsum("nij,njk->nik", Wl, J)
    JTJ = jnp.einsum("nia,nib->ab", J, WJ,
                     preferred_element_type=jnp.float32)
    JTr = jnp.einsum("nia,nij,nj->a", J, Wl, r,
                     preferred_element_type=jnp.float32)
    return c + JTJ[0, 0] + JTr[0]


bench(f"normal equations N={N} default-prec", ne_bf16, jnp.zeros(()))

# --- one-hot deskew vs gather ---
Nn = 32768
Rc = jnp.asarray(rng.normal(size=(65, 12)).astype(np.float32))
i0 = jnp.asarray(rng.integers(0, 65, Nn, dtype=np.int32))


def deskew_gather(i, c):
    idx, acc = c
    v = Rc[idx]
    idx = (mix32(idx) % jnp.uint32(65)).astype(jnp.int32)
    return idx, acc + v[:, 0]


bench("deskew-style gather [32768] from [65,12]", deskew_gather,
      (i0, jnp.zeros(Nn)))


def deskew_onehot(i, c):
    idx, acc = c
    oh = jax.nn.one_hot(idx, 65, dtype=jnp.float32)
    v = oh @ Rc
    idx = (mix32(idx) % jnp.uint32(65)).astype(jnp.int32)
    return idx, acc + v[:, 0]


bench("deskew one-hot matmul [32768,65]@[65,12]", deskew_onehot,
      (i0, jnp.zeros(Nn)))
