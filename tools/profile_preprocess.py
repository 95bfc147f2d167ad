"""Sub-stage profile of the preprocess + insert + align pipeline at the
shipped heavy shapes on the real chip.  Each piece loops K times inside
one dispatch (carry-chained) so the ~30 ms tunnel dispatch overhead
vanishes; prints ms/iter per piece.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
import numpy as np

from eskf_lio_tpu.config import Config, ImuConfig
from eskf_lio_tpu.ops import eig3, preprocess, sortmerge as sm, voxel as vx
from eskf_lio_tpu.map import voxel_map as vm

N_RAW = 131072
KCAP = 32768
C_LOG2 = 19


def _sync(x):
    float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, k=50):
    def scanned(*a):
        def body(c, _):
            return fn(*a, c), ()
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return out

    compiled = jax.jit(scanned).lower(*args).compile()
    out = compiled(*args)
    _sync(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = compiled(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / k * 1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        rng.uniform(-40, 40, size=(N_RAW, 3)).astype(np.float32)
    )
    config = Config(
        imu=ImuConfig(),
        max_raw_points=N_RAW,
        max_scan_points=KCAP,
        hash_capacity_log2=C_LOG2,
        map_delta_log2=14,
    )
    keys = vx.voxel_key(pts, 0.3)
    origin = jnp.full((3,), -512, jnp.int32)
    packed, _ = sm.pack_keys(keys, origin)
    q = pts - (keys.astype(jnp.float32) + 0.5) * 0.3

    # --- raw-scale pieces --------------------------------------------------
    def sort2_raw(p, c):
        s, perm = jax.lax.sort(
            (p + c.astype(jnp.int32), jnp.arange(N_RAW, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        return s[0].astype(jnp.float32) + perm[0]

    timeit("sort2 @131k", sort2_raw, packed)

    perm = jnp.asarray(rng.permutation(N_RAW).astype(np.int32))

    def gather3_raw(qq, pp, c):
        return qq[pp + c.astype(jnp.int32)][0, 0]

    timeit("gather q[perm] [131k,3]", gather3_raw, q, perm)

    raw14 = jnp.concatenate([q, jnp.tile(q, (1, 3)), q[:, :2]], axis=1)

    def gather14_raw(qq, pp, c):
        return qq[pp + c.astype(jnp.int32)][0, 0]

    timeit("gather [131k,14]", gather14_raw, raw14, perm)

    def gather14_sliced(qq, pp, c):
        return qq[pp[:KCAP] + c.astype(jnp.int32)][0, 0]

    timeit("gather [131k->32k,14]", gather14_sliced, raw14, perm)

    def segsum_raw(qq, pp, c):
        seg = jnp.minimum(pp, N_RAW - 1)
        return jax.ops.segment_sum(
            qq + c, seg, num_segments=N_RAW
        )[0, 0]

    timeit("segment_sum [131k,10]", segsum_raw, raw14[:, :10], perm)

    from eskf_lio_tpu.ops import segscan

    skey_sorted = jnp.sort(sm.skey_of(packed))

    def segscan_raw(k_, v_, c):
        return segscan.segsum_sorted(k_, v_ + c)[0, 0]

    timeit("segscan kernel [131k,10]", segscan_raw, skey_sorted, raw14[:, :10])

    def onehot_deskew(p, c):
        idx = (p[:, 0] * 0 + c).astype(jnp.int32) % 65
        table = jnp.ones((65, 12), jnp.float32)
        oh = jax.nn.one_hot(idx, 65, dtype=jnp.float32)
        return jnp.einsum("nm,mk->nk", oh, table)[0, 0]

    timeit("one-hot deskew matmul", onehot_deskew, pts)

    # --- kcap-scale pieces -------------------------------------------------
    pk = packed[:KCAP]
    m10 = raw14[:KCAP, :10]

    def sort2_k(p, c):
        s, perm = jax.lax.sort(
            (p + c.astype(jnp.int32), jnp.arange(KCAP, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        return s[0].astype(jnp.float32) + perm[0]

    timeit("sort2 @32k", sort2_k, pk)

    permk = jnp.asarray(rng.permutation(KCAP).astype(np.int32))

    def gather10_k(qq, pp, c):
        return qq[pp + c.astype(jnp.int32)][0, 0]

    timeit("gather [32k,10]", gather10_k, m10, permk)

    def eigreg(cv, c):
        return eig3.plane_regularize(cv + c * 1e-9, 1e-2)[0, 0, 0]

    covs33 = jnp.eye(3)[None] * 0.01 + jnp.zeros((KCAP, 3, 3))
    timeit("plane_regularize [32k]", eigreg, covs33)

    # --- map probes --------------------------------------------------------
    vmap = vm.VoxelMap.create(config.hash_capacity, config.map_delta_capacity)

    def probe_main(v, p, c):
        pay, idx, lane, found = vm._view_probe(v, p + c.astype(jnp.int32))
        return pay[0, 0] + idx[0]

    skey = sm.skey_of(pk)
    timeit("view probe [32k] @C=2^19", probe_main, vmap.view, skey)

    # full stages for reference
    from eskf_lio_tpu.types import Scan, StateHistory, Pose

    hist = StateHistory(
        t_rel=jnp.concatenate([jnp.full((1,), -jnp.inf), jnp.linspace(-0.1, 0.003, 64)]),
        p=jnp.zeros((65, 3)),
        q=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (65, 1)),
        valid=jnp.ones((65,), bool),
    )
    scan = Scan(
        points=pts,
        t_rel=jnp.linspace(-0.1, 0.0, N_RAW),
        valid=jnp.ones((N_RAW,), bool),
    )
    T_il = Pose(jnp.eye(3), jnp.zeros(3))

    def full_prep(s, h, c):
        out = preprocess.preprocess(
            s._replace(points=s.points + c * 1e-9), h, T_il, config
        )
        return out.points[0, 0]

    timeit("preprocess FULL", full_prep, scan, hist, k=30)

    def just_downsample(p, v, c):
        out = preprocess.downsample_and_covariances(
            p + c * 1e-9, v, config
        )
        return out.points[0, 0]

    timeit("downsample+cov FULL", just_downsample, pts, jnp.ones((N_RAW,), bool), k=30)


if __name__ == "__main__":
    main()
