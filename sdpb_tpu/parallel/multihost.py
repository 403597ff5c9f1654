"""Multi-host (DCN) support: process initialization and global-array
plumbing.

The reference spans nodes over MPI: `Environment.cxx:63-85` discovers
the node topology (`MPI_Comm_split_type(..TYPE_SHARED..)`) and the Q
reduction crosses nodes via pairwise Sendrecv rounds
(`restore_and_reduce.cxx:94-140`).  The TPU-native equivalent needs no
hand-rolled transport: `jax.distributed` connects the processes, every
process passes the same GLOBAL device list to one `Mesh`, and XLA
lowers the existing `psum`/`psum_scatter` collectives hierarchically
over ICI within a slice and DCN across hosts -- the reduction
*schedule* (which tensors reduce when) is unchanged from the
single-host path in `parallel/mesh.py`.

Environment contract (mirrors the standard JAX cluster envs):
  SDPB_COORDINATOR   host:port of process 0 (presence enables
                     distributed mode)
  SDPB_NUM_PROCESSES total process count
  SDPB_PROCESS_ID    this process's rank
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from the SDPB_* environment (no-op
    without SDPB_COORDINATOR).  Returns True when running
    multi-process.  Must be called before any backend is touched."""
    coord = os.environ.get("SDPB_COORDINATOR")
    if not coord:
        # no coordinator configured: single-process -- return WITHOUT
        # touching any backend (the caller may still need to select
        # the platform, which must happen before first backend init)
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["SDPB_NUM_PROCESSES"]),
        process_id=int(os.environ["SDPB_PROCESS_ID"]),
    )
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(arr: np.ndarray, sharding):
    """Create a global jax.Array from a host-replicated numpy array
    under any sharding.  Works in both single- and multi-process mode
    (each process contributes only its addressable shards); replaces
    plain `jax.device_put(arr, sharding)`, which requires all devices
    to be local."""
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def fetch(x) -> np.ndarray:
    """Host numpy value of a jax.Array that is replicated (or otherwise
    locally complete) on every process; multi-process-safe."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shard = x.addressable_data(0)
        if shard.shape == x.shape:          # replicated
            return np.asarray(shard)
        return np.asarray(replicate(x))
    return np.asarray(x)


def replicate(x):
    """All-gather a sharded global array so every process holds a full
    copy (for solution/checkpoint IO, which the reference performs on
    rank 0 after CIRC gathers, `save_solution.cxx:8`)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)
