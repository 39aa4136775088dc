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

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` with auto-detect.

    The reference initializes ``MPI.COMM_WORLD`` unconditionally at import
    (``_src/config.py:168-179``); the JAX equivalent must run *before* any
    device access on every process of a multi-host program.  Call this first
    in your main().

    - With kwargs (``coordinator_address``, ``num_processes``,
      ``process_id``): explicit bring-up, errors propagate.
    - With no kwargs: JAX cluster auto-detection (TPU pod metadata, SLURM,
      Open MPI, ...).  On a plain single-process machine with no detectable
      cluster environment this is a *loud* no-op: a warning is emitted and
      ``False`` is returned, because there is nothing to initialize — but on
      a real pod the auto-detect path performs the full multi-process init.

    Returns True if the distributed runtime is initialized after the call.
    """
    if jax.distributed.is_initialized():
        return True
    try:
        # multi-process CPU (the local-cluster test topology, mirroring the
        # reference's 4-local-rank MPI CI) needs a CPU collectives backend
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — option renamed/absent: keep default
        pass
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except Exception as err:  # noqa: BLE001 — classify below
        if kwargs:
            raise
        # No-arg auto-detect found no cluster environment: single-process.
        warnings.warn(
            "initialize_distributed(): no multi-host cluster environment "
            f"detected ({type(err).__name__}: {err}); continuing "
            "single-process. On a TPU pod slice this should auto-detect — "
            "if you expected multiple hosts, pass coordinator_address/"
            "num_processes/process_id explicitly.",
            stacklevel=2,
        )
        return False


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "batch",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all) named ``axis_name``.

    MuyGPs has a single natural parallel axis — the batch of prediction /
    training points (neighborhood solves are independent; SURVEY.md §2.12) —
    so a 1-D mesh suffices.  Multi-host meshes order devices so that the
    batch axis strides ICI first, DCN last (``jax.devices()`` enumerates
    process 0's local devices first).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_hybrid_mesh(
    axis_names: Sequence[str] = ("dcn", "ici"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 2-D ``(hosts, local_devices)`` mesh with explicit DCN/ICI axes.

    The leading axis spans processes (DCN — the slow inter-host network) and
    the trailing axis spans each process's local devices (ICI).  Shard the
    batch over *both* axes — ``P(("dcn", "ici"), ...)`` — to keep the
    reference's pure batch-data parallelism while letting XLA route the loss
    / sigma^2 all-reduces hierarchically: reduce-scatter over ICI first, then
    the (much smaller) cross-host hop over DCN.  ``sharding.batch_spec``
    emits that spec automatically for 2-D meshes.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n_proc = max((d.process_index for d in devices), default=0) + 1
    if len(devices) % n_proc != 0:
        raise ValueError(
            f"{len(devices)} devices do not divide evenly over "
            f"{n_proc} processes"
        )
    per_proc = len(devices) // n_proc
    # order devices process-major so rows of the mesh are hosts
    devices.sort(key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices).reshape(n_proc, per_proc)
    return Mesh(grid, tuple(axis_names))


def local_chunk_slice(global_count: int, mesh: Mesh) -> slice:
    """The rows of a globally-sharded batch owned by THIS process.

    Multi-host programs construct ``jax.Array``s from per-host shards
    (``jax.make_array_from_process_local_data``); this is the analogue of
    the reference's ``_get_chunk_sizes`` (``_src/mpi_utils.py:36-41``) row
    arithmetic, computed against THE MESH (which may span a subset of the
    job's devices/processes).  XLA needs device-even shards, so a count
    that does not divide the mesh's device count must go through
    :func:`muygpys_tpu.parallel.sharding.shard_ragged_global` (pad + 0/1
    row weights — the reference's uneven chunks, with the extra rows
    existing everywhere but counting nowhere).
    """
    devs = list(mesh.devices.flat)
    n_dev = len(devs)
    if global_count % n_dev != 0:
        raise ValueError(
            f"batch {global_count} must divide the mesh's device count "
            f"{n_dev}; use sharding.shard_ragged_global (pads with edge "
            "rows and returns 0/1 row weights)"
        )
    per_dev = global_count // n_dev
    rank = jax.process_index()
    mine = [i for i, d in enumerate(devs) if d.process_index == rank]
    if not mine:
        return slice(0, 0)
    if mine != list(range(mine[0], mine[0] + len(mine))):
        # NamedSharding hands rows out row-major over the mesh's device
        # order, so a process's rows are contiguous only under the
        # process-major layout make_hybrid_mesh produces
        raise ValueError(
            "this process's mesh devices are not contiguous; build the "
            "mesh with make_hybrid_mesh (process-major device order)"
        )
    return slice(mine[0] * per_dev, (mine[-1] + 1) * per_dev)
