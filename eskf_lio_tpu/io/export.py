"""Map + trajectory export (ref `LocalMap::save`, `LocalMap.cpp:156-167`).

The reference flattens every stored raw point into a PCD and writes the
trajectory as an Open3D PinholeCameraTrajectory JSON.  The TPU map stores
per-voxel statistics rather than raw members (SURVEY.md §7 "map store"), so
the exported cloud is the voxel means (one point per voxel, count-weighted
quality); the trajectory export keeps the same JSON structure so the
reference's offline viewer workflow transfers.
"""

from __future__ import annotations

import json

import numpy as np

from eskf_lio_tpu.map.voxel_map import VoxelMap


def map_to_cloud(
    voxmap: VoxelMap, max_points_per_voxel: int = 1000
) -> tuple[np.ndarray, np.ndarray]:
    """Extract (points [N,3], counts [N]) for occupied voxels (the LSM delta
    tier is folded in first)."""
    from eskf_lio_tpu.map import voxel_map as _vm

    voxmap, _ = _vm.compact(voxmap, max_points_per_voxel=max_points_per_voxel)
    occ = np.asarray(voxmap.live())
    means = np.asarray(voxmap.mean)[occ]
    counts = np.asarray(voxmap.count)[occ]
    return means, counts


def write_pcd(path: str, points: np.ndarray) -> None:
    """Minimal ASCII PCD v0.7 writer (x y z)."""
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA ascii\n"
    )
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, np.asarray(points, np.float32), fmt="%.6f")


def read_pcd(path: str) -> np.ndarray:
    """Reader for the ASCII PCD written above."""
    with open(path) as f:
        lines = f.readlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("DATA")) + 1
    return np.loadtxt(lines[start:], dtype=np.float32).reshape(-1, 3)


def write_trajectory_json(
    path: str,
    times: list[float],
    rotations: list[np.ndarray],
    positions: list[np.ndarray],
) -> None:
    """Trajectory as a PinholeCameraTrajectory-style JSON (the reference's
    output format via Open3D, `LocalMap.cpp:16-18,166`): one 4x4 extrinsic
    per processed scan, column-major like Open3D serialises."""
    params = []
    for t, R, p in zip(times, rotations, positions):
        ext = np.eye(4)
        ext[:3, :3] = R
        ext[:3, 3] = p
        params.append(
            {
                "class_name": "PinholeCameraParameters",
                "extrinsic": ext.flatten(order="F").tolist(),
                "timestamp": t,
                "version_major": 1,
                "version_minor": 0,
            }
        )
    doc = {
        "class_name": "PinholeCameraTrajectory",
        "parameters": params,
        "version_major": 1,
        "version_minor": 0,
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def read_trajectory_json(path: str):
    """Returns (times, rotations, positions)."""
    with open(path) as f:
        doc = json.load(f)
    times, Rs, ps = [], [], []
    for prm in doc["parameters"]:
        ext = np.asarray(prm["extrinsic"]).reshape(4, 4, order="F")
        times.append(prm.get("timestamp", 0.0))
        Rs.append(ext[:3, :3])
        ps.append(ext[:3, 3])
    return times, Rs, ps


def save_run(odo, cloud_path: str, trajectory_path: str) -> None:
    """The framework's `LocalMap::save` equivalent, invoked at shutdown
    (ref `main.cpp:71`)."""
    pts, _ = map_to_cloud(odo.voxmap)
    write_pcd(cloud_path, pts)
    write_trajectory_json(
        trajectory_path, odo.trajectory_t, odo.trajectory_R, odo.trajectory_p
    )
