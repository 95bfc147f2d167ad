"""Checkpoint / resume.

The reference has no mid-run checkpointing — only a terminal PCD+JSON dump
(`LocalMap.cpp:156-167`, SURVEY.md §5.4).  Here the entire odometry state is
a pytree of fixed-shape arrays, so a checkpoint is a single orbax (or npz
fallback) save of (FilterState, VoxelMap, trajectory, host clocks), and
resume is exact: the restored runner continues bit-identically.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from eskf_lio_tpu.map.voxel_map import VoxelMap
from eskf_lio_tpu.types import FilterState


def _to_host(tree):
    # multi-host safe: a leaf of a multi-process sharded map is not fully
    # addressable, so np.asarray would throw — route through the allgather
    # helper (every process must call this; only process 0 writes below)
    from eskf_lio_tpu.io.export import _host_np

    return jax.tree.map(_host_np, tree)


def save_checkpoint(path: str, odo) -> None:
    """Snapshot an `Odometry` (or `ShardedOdometry`) run to `path`.

    Multi-host: collective — every process must call it (the sharded map
    leaves allgather across processes); only process 0 touches the
    filesystem."""
    arrays_host = {
        "state": _to_host(odo.state),
        "voxmap": _to_host(odo.voxmap),
    }
    if jax.process_index() != 0:
        return
    os.makedirs(path, exist_ok=True)
    arrays = {
        **arrays_host,
        "prev_R": np.asarray(odo.prev_R),
        "prev_t": np.asarray(odo.prev_t),
    }
    meta = {
        "initialized": odo.initialized,
        "t_last_update": odo.t_last_update,
        "t_last_evict": odo.t_last_evict,
        "trajectory_t": odo.trajectory_t,
        "trajectory_p": odo.trajectory_p,
        "trajectory_R": odo.trajectory_R,
    }
    flat = {}
    for i, leaf in enumerate(jax.tree.leaves(arrays["state"])):
        flat[f"state_{i}"] = leaf
    for i, leaf in enumerate(jax.tree.leaves(arrays["voxmap"])):
        flat[f"voxmap_{i}"] = leaf
    flat["prev_R"] = arrays["prev_R"]
    flat["prev_t"] = arrays["prev_t"]
    np.savez_compressed(os.path.join(path, "arrays.npz"), **flat)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)


def load_checkpoint(path: str, odo) -> Any:
    """Restore a snapshot into an existing `Odometry` instance (same config).
    Returns the instance.

    Multi-host: collective — every process must call it with `path`
    readable locally (shared filesystem or a pre-distributed copy); the
    `device_put` below re-shards each global array, with every process
    providing the full value and placing only its addressable shards."""
    z = np.load(os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)

    state_leaves = [z[f"state_{i}"] for i in range(7)]
    odo.state = jax.tree.unflatten(
        jax.tree.structure(odo.state), [jnp.asarray(a) for a in state_leaves]
    )
    vox_leaves = [z[f"voxmap_{i}"] for i in range(len(jax.tree.leaves(odo.voxmap)))]
    restored = jax.tree.unflatten(
        jax.tree.structure(odo.voxmap), [jnp.asarray(a) for a in vox_leaves]
    )
    # preserve the existing device placement/sharding of the live map
    odo.voxmap = jax.tree.map(
        lambda new, old: jax.device_put(new, old.sharding),
        restored,
        odo.voxmap,
    )
    odo.prev_R = jnp.asarray(z["prev_R"])
    odo.prev_t = jnp.asarray(z["prev_t"])
    odo.initialized = meta["initialized"]
    odo.t_last_update = meta["t_last_update"]
    odo.t_last_evict = meta["t_last_evict"]
    odo.trajectory_t = list(meta["trajectory_t"])
    odo.trajectory_p = list(meta["trajectory_p"])
    odo.trajectory_R = list(meta["trajectory_R"])
    return odo
