"""Batch-dimension sharding utilities.

TPU-native replacement for the reference's ``_src/mpi_utils.py`` (row-chunk
scatter ``_big_scatter`` :56-71, ``mpi_chunk`` decorator :99-115, allgather
``_consistent_unchunk_tensor`` :118-143).  The model code never changes:
shard the batch tensors once, run the *same* jitted objective / predict
functions, and XLA inserts the all-reduces that the reference's loss and
scale backends perform explicitly (``_src/optimize/loss/mpi.py``,
``_src/optimize/scale/mpi.py``).

Notes on semantics parity:
- The reference pads ragged chunks by giving early ranks one extra row
  (``_get_chunk_sizes``).  Here the batch must be divisible by the mesh size
  or it is padded; ``shard`` pads with edge rows and returns the pad count so
  reductions can mask (losses are sums of per-row terms, so we instead
  recommend trimming the batch to a multiple of the mesh — ``even_batch``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec(mesh: Mesh, ndim: int, axis_name: Optional[str] = None):
    """PartitionSpec sharding the leading dim, replicating the rest.

    On a 1-D mesh the batch is sharded over its single axis; on a hybrid
    ``(dcn, ici)`` mesh (``mesh.make_hybrid_mesh``) the batch is sharded over
    *both* axes jointly so XLA can reduce hierarchically (ICI first, then
    DCN)."""
    if axis_name is None:
        names = tuple(mesh.axis_names)
        lead = names[0] if len(names) == 1 else names
    else:
        lead = axis_name
    return P(lead, *([None] * (ndim - 1)))


def shard(x, mesh: Mesh, axis_name: Optional[str] = None):
    """Place an array with its leading (batch) axis sharded over the mesh."""
    x = jnp.asarray(x)
    sharding = NamedSharding(mesh, batch_spec(mesh, x.ndim, axis_name))
    return jax.device_put(x, sharding)


def replicate(x, mesh: Mesh):
    """Place an array fully replicated over the mesh."""
    x = jnp.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(tensors, mesh: Mesh, axis_name: Optional[str] = None):
    """Shard every tensor in a tuple/list along its leading axis."""
    return type(tensors)(shard(t, mesh, axis_name) for t in tensors)


def even_batch(batch_count: int, mesh: Mesh) -> int:
    """Largest batch size <= batch_count divisible by the mesh size."""
    n = mesh.devices.size
    return (batch_count // n) * n


def shard_global(x, mesh: Mesh, axis_name: Optional[str] = None):
    """Multi-process-safe shard along the leading (batch) axis.

    Every process passes the FULL (replicated) host array; each contributes
    only its own row chunk to the global ``jax.Array``.  Single-process
    meshes reduce to :func:`shard`.  This is the analogue of the reference's
    rank-0 scatter (``_src/mpi_utils.py:56-71``) for data small enough to
    replicate on hosts; shard the *source* reads instead when it is not.
    """
    import jax as _jax

    from muygpys_tpu.parallel.mesh import local_chunk_slice

    x = np.asarray(x)
    sharding = NamedSharding(mesh, batch_spec(mesh, x.ndim, axis_name))
    if _jax.process_count() == 1:
        return _jax.device_put(jnp.asarray(x), sharding)
    local = x[local_chunk_slice(x.shape[0], mesh)]
    return _jax.make_array_from_process_local_data(sharding, local, x.shape)


def shard_batch_global(tensors, mesh: Mesh, axis_name: Optional[str] = None):
    """:func:`shard_global` over a tuple/list of tensors."""
    return type(tensors)(shard_global(t, mesh, axis_name) for t in tensors)


def gather_global(x) -> np.ndarray:
    """Materialize a (possibly sharded) array on the host — the analogue of
    the reference's test-only allgather (``_consistent_unchunk_tensor``)."""
    return np.asarray(jax.device_get(x))
