"""Generate tests/data/golden.db3 — the byte-frozen rosbag2 golden fixture.

The decoder (`eskf_lio_tpu/io/rosbag2.py`) must be tested against bytes it
did not co-author: the round-trip test's CdrWriter shares an alignment
helper with the reader, so a mirrored alignment bug would pass.  This
generator assembles every payload with EXPLICIT, hand-computed offsets
taken from the OMG XCDR1 spec (little-endian, alignment relative to the
start of the serialized payload after the 4-byte encapsulation header) and
the sensor_msgs IDL — every pad byte is spelled out, none is derived from
a shared helper.  The resulting .db3 is committed; the test asserts exact
decoded values against the constants below.

Message layouts verified by hand:

sensor_msgs/msg/Imu (XCDR1 LE), frame_id "imu_link":
  abs   rel  content
  0..3   -   encapsulation 00 01 00 00  (CDR_LE, options 0)
  4      0   header.stamp.sec   int32
  8      4   header.stamp.nanosec uint32
  12     8   frame_id length uint32 = 9  ("imu_link" + NUL)
  16    12   "imu_link\0"               (ends rel 21)
  25    21   3 pad bytes (align 8 for float64)
  28    24   orientation x y z w        4 x f64   (ends rel 56)
  60    56   orientation_covariance     9 x f64   (ends rel 128)
  132  128   angular_velocity x y z     3 x f64   (ends rel 152)
  156  152   angular_velocity_cov       9 x f64   (ends rel 224)
  228  224   linear_acceleration x y z  3 x f64   (ends rel 248)
  252  248   linear_acceleration_cov    9 x f64   (ends rel 320)
  total 324 bytes

sensor_msgs/msg/PointCloud2 (XCDR1 LE), frame_id "PandarXT-32",
fields x/y/z/intensity (f32 @ 0/4/8/12), timestamp (f64 @ 16),
ring (u16 @ 24), point_step 32:
  abs   rel  content
  4      0   stamp.sec int32
  8      4   stamp.nanosec uint32
  12     8   frame_id length uint32 = 12 ("PandarXT-32" + NUL)
  16    12   "PandarXT-32\0"            (ends rel 24, already 4-aligned)
  28    24   height uint32 = 1
  32    28   width uint32 = n
  36    32   fields length uint32 = 6
  -- per field {string name; u32 offset; u8 datatype; u32 count}:
  field "x": rel 36 len=2, rel 40 "x\0", rel 42 +2 pad, rel 44 offset,
             rel 48 datatype u8, rel 49 +3 pad, rel 52 count -> next rel 56
  (same shape for every 1-letter name; longer names follow the same rule
  with their own spelled-out padding below)
  after fields: u8 is_bigendian; 3 pad; u32 point_step; u32 row_step;
  u32 data length; data bytes; u8 is_dense
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "tests", "data")

FLOAT32, FLOAT64, UINT16 = 7, 8, 3


def golden_imu(sec: int, nsec: int, gyro, accel) -> bytes:
    b = bytearray()
    b += b"\x00\x01\x00\x00"                      # encapsulation CDR_LE
    b += struct.pack("<i", sec)                    # rel 0
    b += struct.pack("<I", nsec)                   # rel 4
    b += struct.pack("<I", 9)                      # rel 8: strlen incl NUL
    b += b"imu_link\x00"                           # rel 12..20
    b += b"\x00\x00\x00"                           # rel 21: pad to 24 (f64)
    b += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)    # rel 24: orientation
    b += struct.pack("<9d", *([0.0] * 9))          # rel 56
    b += struct.pack("<3d", *gyro)                 # rel 128
    b += struct.pack("<9d", *([0.0] * 9))          # rel 152
    b += struct.pack("<3d", *accel)                # rel 224
    b += struct.pack("<9d", *([0.0] * 9))          # rel 248..319
    assert len(b) == 324, len(b)
    return bytes(b)


def golden_cloud(sec: int, nsec: int, pts, intens, tstamps, rings) -> bytes:
    n = len(pts)
    b = bytearray()
    b += b"\x00\x01\x00\x00"
    b += struct.pack("<i", sec)                    # rel 0
    b += struct.pack("<I", nsec)                   # rel 4
    b += struct.pack("<I", 12)                     # rel 8
    b += b"PandarXT-32\x00"                        # rel 12..23
    b += struct.pack("<I", 1)                      # rel 24: height
    b += struct.pack("<I", n)                      # rel 28: width
    b += struct.pack("<I", 6)                      # rel 32: n_fields

    def field(name: bytes, pad_after_name: int, off: int, dt: int) -> bytes:
        f = struct.pack("<I", len(name) + 1) + name + b"\x00"
        f += b"\x00" * pad_after_name              # pad to 4 for offset
        f += struct.pack("<I", off)
        f += struct.pack("<B", dt)
        f += b"\x00\x00\x00"                       # pad to 4 for count
        f += struct.pack("<I", 1)
        return f

    # 1-letter names: 4(len)+2(str) = 6 -> pad 2; "intensity": 4+10=14 ->
    # pad 2; "timestamp": same; "ring": 4+5=9 -> pad 3.  Field records end
    # 4-aligned, so these pads are position-independent.
    b += field(b"x", 2, 0, FLOAT32)
    b += field(b"y", 2, 4, FLOAT32)
    b += field(b"z", 2, 8, FLOAT32)
    b += field(b"intensity", 2, 12, FLOAT32)
    b += field(b"timestamp", 2, 16, FLOAT64)
    b += field(b"ring", 3, 24, UINT16)

    b += struct.pack("<B", 0)                      # is_bigendian
    b += b"\x00\x00\x00"                           # pad to 4
    b += struct.pack("<I", 32)                     # point_step
    b += struct.pack("<I", 32 * n)                 # row_step
    data = bytearray(32 * n)
    for i, ((x, y, z), it, ts, rg) in enumerate(
        zip(pts, intens, tstamps, rings)
    ):
        struct.pack_into("<ffff", data, 32 * i, x, y, z, it)
        struct.pack_into("<d", data, 32 * i + 16, ts)
        struct.pack_into("<H", data, 32 * i + 24, rg)
    b += struct.pack("<I", len(data))
    b += data
    b += struct.pack("<B", 1)                      # is_dense
    return bytes(b)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    db_path = os.path.join(OUT_DIR, "golden.db3")
    if os.path.exists(db_path):
        os.remove(db_path)

    # fixed, human-auditable values (no RNG: the fixture must be
    # reproducible byte-for-byte from this script)
    imu = [
        # (sec, nsec, gyro, accel)
        (1651050000, 100000000, (0.01, -0.02, 0.03), (0.1, 0.2, 9.81)),
        (1651050000, 102500000, (0.04, 0.05, -0.06), (-0.3, 0.0, 9.75)),
        (1651050000, 105000000, (0.0, 0.0, 0.5), (0.0, -0.1, 9.9)),
    ]
    # cloud points deliberately unsorted in time: the decoder must sort
    clouds = [
        (
            1651050000, 100000000,
            [(1.0, 2.0, 0.5), (-3.0, 0.25, 1.0), (4.5, -1.5, 2.0),
             (0.125, 0.25, -0.5)],
            [10.0, 20.0, 30.0, 40.0],
            [1651050000.08, 1651050000.02, 1651050000.05, 1651050000.10],
            [0, 7, 15, 31],
        ),
        (
            1651050000, 200000000,
            [(5.0, 5.0, 5.0), (float("nan"), 1.0, 1.0), (-2.0, 3.0, 0.0)],
            [1.0, 2.0, 3.0],
            [1651050000.15, 1651050000.17, 1651050000.20],
            [2, 4, 6],
        ),
    ]

    db = sqlite3.connect(db_path)
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
    rows = []
    for sec, nsec, gyro, accel in imu:
        rows.append(
            (1, sec * 10**9 + nsec, golden_imu(sec, nsec, gyro, accel))
        )
    for sec, nsec, pts, intens, ts, rings in clouds:
        rows.append(
            (
                2,
                sec * 10**9 + nsec,
                golden_cloud(sec, nsec, pts, intens, ts, rings),
            )
        )
    rows.sort(key=lambda r: r[1])
    db.executemany(
        "INSERT INTO messages(topic_id, timestamp, data) VALUES (?,?,?)",
        rows,
    )
    db.commit()
    db.close()

    expected = {
        "imu": [
            {"t": sec + nsec * 1e-9, "gyro": list(g), "accel": list(a)}
            for sec, nsec, g, a in imu
        ],
        "clouds": [
            {
                # finite points only, in per-point time order
                "points_time_sorted": sorted(
                    (
                        [ts, list(p)]
                        for p, ts in zip(pts, t)
                        if all(v == v for v in p)  # NaN-free
                    ),
                ),
            }
            for _, _, pts, _, t, _ in clouds
        ],
    }
    with open(os.path.join(OUT_DIR, "golden_expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print("wrote", db_path)


if __name__ == "__main__":
    main()
