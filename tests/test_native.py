"""Native runtime (C++ SPSC queue, scan packing) tests; skipped when the
toolchain is unavailable."""

import numpy as np
import pytest

from eskf_lio_tpu.io import native_runtime as nr

pytestmark = pytest.mark.skipif(
    nr.load() is None, reason="native runtime not built"
)


def test_spsc_push_pop():
    q = nr.NativeSpscQueue(nr.IMU_DTYPE, 16)
    rec = np.zeros((), dtype=nr.IMU_DTYPE)
    rec["t"] = 123.5
    rec["gyro"] = [1, 2, 3]
    rec["accel"] = [4, 5, 6]
    assert q.push(rec)
    assert len(q) == 1
    out = q.pop()
    assert out is not None
    assert out["t"] == 123.5
    np.testing.assert_array_equal(out["gyro"], [1, 2, 3])
    assert q.pop() is None


def test_spsc_pop_all_order():
    q = nr.NativeSpscQueue(nr.IMU_DTYPE, 64)
    for i in range(10):
        rec = np.zeros((), dtype=nr.IMU_DTYPE)
        rec["t"] = float(i)
        q.push(rec)
    out = q.pop_all()
    assert len(out) == 10
    np.testing.assert_array_equal(out["t"], np.arange(10.0))
    assert len(q) == 0


def test_spsc_full():
    q = nr.NativeSpscQueue(nr.IMU_DTYPE, 4)
    rec = np.zeros((), dtype=nr.IMU_DTYPE)
    for _ in range(4):
        assert q.push(rec)
    assert not q.push(rec)  # full
    q.pop()
    assert q.push(rec)


def test_pack_scan_matches_numpy(rng):
    n = 1000
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[17] = np.nan  # dropped
    t = 1000.0 + np.sort(rng.uniform(-0.1, 0, n))
    cap = 1200
    ox, ot, ov, m = nr.pack_scan(xyz, t, 1000.0, cap)
    assert m == n - 1
    assert ov.sum() == n - 1
    finite = np.isfinite(xyz).all(axis=1)
    np.testing.assert_array_equal(ox[: n - 1], xyz[finite])
    np.testing.assert_allclose(
        ot[: n - 1], (t[finite] - 1000.0).astype(np.float32)
    )
    assert not ov[n - 1 :].any()


def test_pack_scan_truncates(rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    t = np.full(100, 5.0)
    ox, ot, ov, m = nr.pack_scan(xyz, t, 5.0, 64)
    assert m == 64
    assert ov.all()
