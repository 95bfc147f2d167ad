"""Multi-host wiring: `jax.distributed` initialization + global-array glue.

The reference has no distributed dimension at all (SURVEY.md §2b/§5.8: its
communication surface is ROS pub/sub into one process plus OpenMP).  This
module is the greenfield multi-host layer of the TPU framework:

* `initialize()` — env-var/flag driven `jax.distributed.initialize`, called
  once per process before any backend use (the CLI exposes
  `--coordinator/--num-processes/--process-id`).  After it, `jax.devices()`
  returns the GLOBAL device list; build the `Mesh` over that and the
  sharded odometry step (`parallel.sharded_map`) runs unchanged — its
  psums ride ICI within a slice and DCN across hosts.
* `replicate_to_mesh()` — lifts per-host (replicated) numpy/jax inputs into
  global `jax.Array`s spanning a multi-process mesh: every process supplies
  identical host data (each host reads the same sensor stream in lockstep),
  so the callback hands each local device its full copy.
* Fully-replicated OUTPUTS (poses, diagnostics) convert to numpy directly —
  `np.asarray` on a fully-replicated global array reads the local replica —
  so the host driver needs no other changes.

Tested by `tests/test_distributed.py`: two localhost processes, 2×2 virtual
CPU devices, one shared coordinator; the 4-device trajectory must match the
single-process 4-device mesh.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> tuple[int, int]:
    """Initialize the JAX distributed runtime for multi-host execution.

    Arguments fall back to the standard env vars
    (`JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`) and
    to single-process when neither is given.  Must run before any JAX
    backend is touched.  Returns (num_processes, process_id)."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator is None and (num_processes or 1) <= 1:
        return 1, 0  # single-process: nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count(), jax.process_index()


def replicate_to_mesh(tree, mesh):
    """Lift a pytree of per-host arrays (identical on every process) into
    fully-replicated global `jax.Array`s over `mesh`.  Leaves that are
    already global arrays on a multi-process sharding pass through."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def lift(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return leaf  # already global
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, repl, lambda idx: arr[idx]
        )

    return jax.tree.map(lift, tree)


def shard_to_mesh(tree, mesh, axis_name: str):
    """Lift a pytree of FULL per-host arrays into global arrays sharded
    along their leading axis over `axis_name` (every process supplies the
    full array; each device keeps only its block)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(axis_name))

    def lift(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return leaf
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, shard, lambda idx: arr[idx]
        )

    return jax.tree.map(lift, tree)
