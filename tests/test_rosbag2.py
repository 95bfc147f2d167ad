"""rosbag2 ingestion: CDR decode + sqlite read, round-tripped against a
hand-rolled encoder that mirrors what rmw_fastrtps writes for
sensor_msgs/Imu and sensor_msgs/PointCloud2 (XCDR1 little-endian)."""

import sqlite3
import struct

import numpy as np

from eskf_lio_tpu.io import rosbag2


class CdrWriter:
    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # LE encapsulation

    def _align(self, n):
        rel = len(self.buf) - 4
        self.buf.extend(b"\x00" * ((-rel) % n))

    def u8(self, v):
        self.buf.append(v)

    def u32(self, v):
        self._align(4)
        self.buf.extend(struct.pack("<I", v))

    def i32(self, v):
        self._align(4)
        self.buf.extend(struct.pack("<i", v))

    def f64(self, *vs):
        self._align(8)
        for v in vs:
            self.buf.extend(struct.pack("<d", v))

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf.extend(b)

    def bytes_seq(self, b):
        self.u32(len(b))
        self.buf.extend(b)

    def header(self, t, frame="imu"):
        sec = int(t)
        self.i32(sec)
        self.u32(int(round((t - sec) * 1e9)))
        self.string(frame)


def encode_imu(t, gyro, accel):
    w = CdrWriter()
    w.header(t)
    w.f64(0.0, 0.0, 0.0, 1.0)  # orientation
    w.f64(*([0.0] * 9))
    w.f64(*gyro)
    w.f64(*([0.0] * 9))
    w.f64(*accel)
    w.f64(*([0.0] * 9))
    return bytes(w.buf)


def encode_cloud(t0, xyz, ts, extra_field=True):
    """PointCloud2 with Pandar-style layout: x,y,z f32 + f64 timestamp
    (+ an extra intensity field to exercise offset handling)."""
    n = len(xyz)
    point_step = 32
    data = bytearray(n * point_step)
    for i in range(n):
        struct.pack_into("<fff", data, i * point_step, *xyz[i])
        if extra_field:
            struct.pack_into("<f", data, i * point_step + 12, 7.0)
        struct.pack_into("<d", data, i * point_step + 16, ts[i])
    w = CdrWriter()
    w.header(t0, "pandar")
    w.u32(1)  # height
    w.u32(n)  # width
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7)]
    if extra_field:
        fields.append(("intensity", 12, 7))
    fields.append(("timestamp", 16, 8))
    w.u32(len(fields))
    for name, off, dt in fields:
        w.string(name)
        w.u32(off)
        w.u8(dt)
        w.u32(1)
    w.u8(0)  # is_bigendian
    w.u32(point_step)
    w.u32(point_step * n)
    w.bytes_seq(bytes(data))
    w.u8(1)  # is_dense
    return bytes(w.buf)


def make_bag(path, imu_msgs, cloud_msgs):
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
        " serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    db.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    db.execute(
        "INSERT INTO topics VALUES (1, '/alphasense/imu',"
        " 'sensor_msgs/msg/Imu', 'cdr', '')"
    )
    db.execute(
        "INSERT INTO topics VALUES (2, '/hesai/pandar',"
        " 'sensor_msgs/msg/PointCloud2', 'cdr', '')"
    )
    rows = [(1, int(t * 1e9), blob) for t, blob in imu_msgs]
    rows += [(2, int(t * 1e9), blob) for t, blob in cloud_msgs]
    rows.sort(key=lambda r: r[1])
    db.executemany(
        "INSERT INTO messages(topic_id, timestamp, data) VALUES (?,?,?)",
        rows,
    )
    db.commit()
    db.close()


def test_roundtrip(tmp_path, rng):
    t0 = 1000.0
    imu_msgs = []
    for i in range(40):
        t = t0 + i * 0.0025
        gyro = rng.normal(size=3)
        accel = rng.normal(size=3) + [0, 0, 9.81]
        imu_msgs.append((t, encode_imu(t, gyro, accel)))

    cloud_msgs = []
    true_clouds = []
    for k in range(2):
        n = 50
        xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        ts = np.sort(t0 + 0.05 * k + rng.uniform(0, 0.05, n))
        true_clouds.append((xyz, ts))
        cloud_msgs.append((ts[0], encode_cloud(ts[0], xyz, ts)))

    bag = str(tmp_path / "test.db3")
    make_bag(bag, imu_msgs, cloud_msgs)

    seq = rosbag2.load_rosbag2(bag)
    assert len(seq.imu) == 40
    assert len(seq.scans) == 2
    # IMU values survive the CDR round trip exactly
    i0 = seq.imu[0]
    assert abs(i0.t - t0) < 1e-6
    # clouds: points sorted by per-point time, values exact
    for rec, (xyz, ts) in zip(seq.scans, true_clouds):
        order = np.argsort(ts, kind="stable")
        np.testing.assert_allclose(rec.points, xyz[order], rtol=0, atol=0)
        np.testing.assert_allclose(rec.t, ts[order], rtol=0, atol=0)
        assert rec.end_time == ts.max()
        assert rec.start_time == ts.min()


def test_golden_fixture():
    """Decode the byte-frozen committed fixture (tests/data/golden.db3).

    Unlike the round-trip test above — whose CdrWriter shares alignment
    logic with the reader, so a mirrored bug would pass — the golden bag's
    payloads were assembled with explicit hand-computed offsets from the
    XCDR1 spec (`tools/make_golden_bag.py` documents every pad byte) and
    committed as bytes.  It uses a realistic Hesai PandarXT-32 layout:
    x/y/z/intensity f32, f64 absolute timestamp, u16 ring, point_step 32,
    unsorted point times, and one NaN point."""
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    bag = os.path.join(here, "data", "golden.db3")
    with open(os.path.join(here, "data", "golden_expected.json")) as f:
        exp = json.load(f)

    seq = rosbag2.load_rosbag2(bag)
    assert len(seq.imu) == len(exp["imu"])
    for rec, e in zip(seq.imu, exp["imu"]):
        assert abs(rec.t - e["t"]) < 1e-9
        np.testing.assert_allclose(rec.gyro, e["gyro"], rtol=0, atol=0)
        np.testing.assert_allclose(rec.accel, e["accel"], rtol=0, atol=0)

    assert len(seq.scans) == len(exp["clouds"])
    for rec, e in zip(seq.scans, exp["clouds"]):
        want = e["points_time_sorted"]  # [[t, [x,y,z]], ...] time-ordered
        assert len(rec.points) == len(want)
        for i, (t_i, p_i) in enumerate(want):
            assert abs(rec.t[i] - t_i) < 1e-6
            np.testing.assert_allclose(
                rec.points[i], np.asarray(p_i, np.float32), rtol=0, atol=0
            )
        assert rec.start_time == rec.t[0] and rec.end_time == rec.t[-1]


def test_nan_points_dropped(tmp_path, rng):
    t0 = 5.0
    xyz = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    xyz[3] = np.nan
    ts = np.sort(t0 + rng.uniform(0, 0.1, 10))
    bag = str(tmp_path / "n.db3")
    make_bag(bag, [(t0, encode_imu(t0, [0, 0, 0], [0, 0, 9.81]))],
             [(t0, encode_cloud(t0, xyz, ts))])
    seq = rosbag2.load_rosbag2(bag)
    assert len(seq.scans[0].points) == 9
    assert np.isfinite(seq.scans[0].points).all()


def test_directory_and_missing_topic(tmp_path, rng):
    bag_dir = tmp_path / "bagdir"
    bag_dir.mkdir()
    make_bag(str(bag_dir / "b_0.db3"),
             [(1.0, encode_imu(1.0, [0, 0, 0], [0, 0, 9.81]))], [])
    seq = rosbag2.load_rosbag2(str(bag_dir))
    assert len(seq.imu) == 1 and len(seq.scans) == 0
    import pytest
    with pytest.raises(KeyError):
        rosbag2.load_rosbag2(str(bag_dir), lidar_topic="/nope")
