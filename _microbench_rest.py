import time, functools
print = functools.partial(print, flush=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
K = 50
def mix32(x):
    x = x.astype(jnp.uint32); x = x ^ (x >> 16); x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15); x = x * jnp.uint32(0x846CA68B); x = x ^ (x >> 16)
    return x
def bench(name, body, init_carry, k=K):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, k, body, c)
    out = run(init_carry)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = run(init_carry)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{name:44s} {(dt - BASELINE)/k:8.3f} ms/op   (dispatch {dt:.1f} ms)")
rng = np.random.default_rng(0)
@jax.jit
def _empty(c):
    return jax.lax.fori_loop(0, K, lambda i, x: x + 1.0, c)
_ = _empty(jnp.zeros(())); float(np.asarray(_))
t0 = time.perf_counter(); _ = _empty(jnp.zeros(())); float(np.asarray(_))
BASELINE = (time.perf_counter() - t0) * 1e3
print(f"baseline: {BASELINE:.2f} ms")

C = 524288
skeys = jnp.sort(jnp.asarray(rng.integers(0, 1 << 31, C, dtype=np.int32)))
q0 = jnp.asarray(rng.integers(0, 1 << 31, 16384, dtype=np.int32))
BB = 8192
bucket_of = jnp.right_shift(skeys, 31 - 13).astype(jnp.int32)
starts = jnp.searchsorted(bucket_of, jnp.arange(BB, dtype=jnp.int32)).astype(jnp.int32)
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
bench("bucketed lookup (2+9+1 rounds) q=16384", bucket_lookup, (q0, jnp.zeros(16384, jnp.int32)))

n = 32768
seg = jnp.sort(jnp.asarray(rng.integers(0, n, n, dtype=np.int32)))
v0 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
bench(f"segment_sum [{n}]->[{n}]", lambda i, c: jax.ops.segment_sum(c + 1.0, seg, num_segments=n), v0)
v10 = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
bench(f"segment_sum [{n},10]", lambda i, c: jax.ops.segment_sum(c + 1.0, seg, num_segments=n), v10)
bench(f"cumsum [{n},10]", lambda i, c: jnp.cumsum(c, axis=0) * 1e-3, v10)
idxp = jnp.asarray(rng.permutation(n).astype(np.int32))
bench(f"scatter-add perm [{n}]", lambda i, c: jnp.zeros((n,), jnp.float32).at[idxp].add(c), v0)
bench(f"scatter-rows perm [{n},10]", lambda i, c: jnp.zeros((n, 10), jnp.float32).at[idxp].add(c), v10)
bench(f"row-gather seg_m[seg_id] [{n},10]", lambda i, c: c.at[:, 0].add(1.0)[seg], v10)

m64 = jnp.asarray((rng.normal(size=(64, 18, 18)) * 0.1).astype(np.float32))
bench("assoc_scan matmul [64,18,18]",
      lambda i, c: jax.lax.associative_scan(
          lambda a, b: jnp.einsum("mij,mjk->mik", a, b, precision=jax.lax.Precision.HIGHEST), c) * 0.99,
      m64)

N = 16384
J = jnp.asarray(rng.normal(size=(N, 3, 6)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(N, 3, 3)).astype(np.float32))
r = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
def ne(i, c):
    Wl = W * (1.0 + c * 1e-9)
    WJ = jnp.einsum("nij,njk->nik", Wl, J, precision=jax.lax.Precision.HIGHEST)
    JTJ = jnp.einsum("nia,nib->ab", J, WJ, precision=jax.lax.Precision.HIGHEST)
    JTr = jnp.einsum("nia,nij,nj->a", J, Wl, r, precision=jax.lax.Precision.HIGHEST)
    return c + JTJ[0, 0] + JTr[0]
bench(f"normal equations N={N} f32-highest", ne, jnp.zeros(()))

Nn = 32768
Rc = jnp.asarray(rng.normal(size=(65, 12)).astype(np.float32))
i0 = jnp.asarray(rng.integers(0, 65, Nn, dtype=np.int32))
def deskew_onehot(i, c):
    idx, acc = c
    oh = jax.nn.one_hot(idx, 65, dtype=jnp.float32)
    v = oh @ Rc
    idx = (mix32(idx) % jnp.uint32(65)).astype(jnp.int32)
    return idx, acc + v[:, 0]
bench("deskew one-hot matmul [32768,65]@[65,12]", deskew_onehot, (i0, jnp.zeros(Nn)))
def deskew_gather(i, c):
    idx, acc = c
    v = Rc[idx]
    idx = (mix32(idx) % jnp.uint32(65)).astype(jnp.int32)
    return idx, acc + v[:, 0]
bench("deskew-style row-gather [32768] from [65,12]", deskew_gather, (i0, jnp.zeros(Nn)))
def rank_compare(i, c):
    idx, acc = c
    t = jnp.sort(jnp.asarray(np.sort(rng.uniform(-0.1, 0.0, 65)).astype(np.float32)))
    tr = acc * 1e-9
    ridx = jnp.sum((tr[:, None] >= t[None, :]).astype(jnp.int32), axis=1)
    return idx, acc + ridx.astype(jnp.float32)
bench("rank-by-compare [32768,65]", rank_compare, (i0, jnp.zeros(Nn)))
