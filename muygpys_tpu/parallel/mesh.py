"""Device mesh construction and multi-host initialization.

TPU-native replacement for the reference's MPI world setup
(``_src/config.py:168-179``): instead of ``MPI.COMM_WORLD`` + rank-chunking,
we build a ``jax.sharding.Mesh`` whose single ``"batch"`` axis spans all
devices (ICI within a slice, DCN across hosts), and let XLA place collectives.

The reference's five comms primitives (SURVEY.md §2.12: scatter, allgather,
allreduce(SUM), bcast, rank/size) map to:
- scatter      -> ``shard`` (sharding constraint on the batch axis)
- allreduce    -> ``jax.lax.psum`` / XLA all-reduce inserted for sums over a
                  sharded axis
- allgather    -> ``jax.lax.all_gather`` / ``gather_global``
- bcast        -> replication (host-0 PRNG results folded into a replicated
                  jit), or ``replicate``
- rank/size    -> ``jax.process_index()`` / mesh shape
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: wraps ``jax.distributed.initialize``.

    No-op when running single-process (the common single-slice case).
    Accepts the same kwargs (coordinator_address, num_processes, process_id).
    """
    if jax.process_count() > 1:
        return  # already initialized
    if kwargs:
        jax.distributed.initialize(**kwargs)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "batch",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all) named ``axis_name``.

    MuyGPs has a single natural parallel axis — the batch of prediction /
    training points (neighborhood solves are independent; SURVEY.md §2.12) —
    so a 1-D mesh suffices.  Multi-host meshes order devices so that the
    batch axis strides ICI first, DCN last.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
