"""Multi-host (multi-process) execution: jax.distributed bring-up and
global-array construction for the distributed BA.

The reference is a single process (SURVEY.md section 2: 4 pthreads over
shared memory); scaling past one host is this build's north-star
differentiator. The model is standard multi-controller JAX:

- every process runs the same program and calls
  `initialize_from_env()` once at startup (coordinator address +
  process count + process id, from arguments or the environment);
- after that, `jax.devices()` spans ALL hosts, and a Mesh over it makes
  `shard_map` collectives ride ICI within a slice and DCN across
  hosts — no NCCL/MPI translation, XLA inserts the transfers;
- host-side map state is replicated per process (every tracker owns its
  own sequences); `make_global_problem` lifts the replicated numpy
  arrays into global jax.Arrays laid out for the point-sharded BA, so
  `dist_bundle_adjust` runs unchanged on 1 or N hosts.

Environment variables (used when arguments are omitted):
  SLAM_COORDINATOR  host:port of process 0 (default 127.0.0.1:9731)
  SLAM_NUM_PROCS    total process count (default 1)
  SLAM_PROC_ID      this process's id (default 0)
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_test_tpu.solvers.ba_core import BAProblem
from orb_slam2_test_tpu.parallel.dist_ba import AXIS


def initialize_from_env(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Bring up jax.distributed if this run spans multiple processes.

    Returns True if distributed mode was initialized, False for the
    single-process fast path (nothing to do). Safe to call once per
    process, before any backend use.
    """
    num_processes = int(
        num_processes
        if num_processes is not None
        else os.environ.get("SLAM_NUM_PROCS", "1")
    )
    if num_processes <= 1:
        return False
    coordinator = coordinator or os.environ.get(
        "SLAM_COORDINATOR", "127.0.0.1:9731"
    )
    process_id = int(
        process_id
        if process_id is not None
        else os.environ.get("SLAM_PROC_ID", "0")
    )
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def global_ba_mesh() -> Mesh:
    """One-axis mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def make_global_problem(prob: BAProblem, mesh: Mesh) -> BAProblem:
    """Lift a host-replicated (numpy / single-device) BAProblem into
    global jax.Arrays for `dist_bundle_adjust` on a multi-host mesh.

    The problem must already be sharded with shard_problem(mesh.size)
    (obs/pt rows blocked by shard). Every process must hold an identical
    copy — true in the multi_seq driver where maps are broadcast via the
    joint-BA write-back.
    """
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())

    def lift(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    return BAProblem(
        cam_Tcw=lift(prob.cam_Tcw, repl),
        cam_fixed=lift(prob.cam_fixed, repl),
        pt_xyz=lift(prob.pt_xyz, sharded),
        pt_valid=lift(prob.pt_valid, sharded),
        obs_cam=lift(prob.obs_cam, sharded),
        obs_pt=lift(prob.obs_pt, sharded),
        obs_uvr=lift(prob.obs_uvr, sharded),
        obs_isig2=lift(prob.obs_isig2, sharded),
        obs_valid=lift(prob.obs_valid, sharded),
    )
