"""Batch-dimension sharding utilities.

TPU-native replacement for the reference's ``_src/mpi_utils.py`` (row-chunk
scatter ``_big_scatter`` :56-71, ``mpi_chunk`` decorator :99-115, allgather
``_consistent_unchunk_tensor`` :118-143).  The model code never changes:
shard the batch tensors once, run the *same* jitted objective / predict
functions, and XLA inserts the all-reduces that the reference's loss and
scale backends perform explicitly (``_src/optimize/loss/mpi.py``,
``_src/optimize/scale/mpi.py``).

Notes on semantics parity:
- The reference handles ragged chunks by giving early ranks one extra row
  (``_get_chunk_sizes``).  XLA wants equal shards, so ragged batches go
  through :func:`shard_ragged` instead: pad with edge rows + 0/1 row
  weights that every loss and the analytic scale honor — padded rows are
  semantically absent and sharded results equal serial exactly
  (tests/test_distributed.py ragged tests).  ``even_batch`` remains for
  callers who prefer trimming.
"""

from __future__ import annotations

from typing import Optional

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


def shard_ragged(tensors, mesh: Mesh, axis_name: Optional[str] = None):
    """Shard a batch whose size does not divide the mesh: pad + mask.

    Pads every tensor's leading axis up to a mesh multiple with copies of
    the last row (keeping kernel matrices well-conditioned) and returns
    ``(padded_sharded_tensors, row_weights)`` where ``row_weights`` is a
    0/1 vector, sharded the same way.  Pass it to the objective as
    ``loss_kwargs={"row_weights": row_weights}``: every loss and the
    analytic scale weight per-row terms by it, so padded rows are
    semantically absent — objective, gradients, and sigma^2 equal the
    unpadded serial values exactly (tests/test_distributed.py).

    This is the TPU equivalent of the reference's ragged MPI chunks
    (``_get_chunk_sizes`` gives early ranks one extra row,
    ``_src/mpi_utils.py:36-41``): XLA needs equal shards, so the extra
    rows exist everywhere but count nowhere.
    """
    batch = int(tensors[0].shape[0])
    n = mesh.devices.size
    padded = -(-batch // n) * n
    pad = padded - batch

    def pad_one(t):
        t = jnp.asarray(t)
        if pad:
            t = jnp.concatenate(
                [t] + [t[-1:]] * pad, axis=0
            )
        return shard(t, mesh, axis_name)

    out = type(tensors)(pad_one(t) for t in tensors)
    weights = jnp.where(jnp.arange(padded) < batch, 1.0, 0.0)
    return out, shard(weights, mesh, axis_name)


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


def shard_ragged_global(
    tensors, mesh: Mesh, axis_name: Optional[str] = None
):
    """Multi-process :func:`shard_ragged`: any global batch size.

    The reference's ``_get_chunk_sizes`` hands uneven chunks to MPI ranks
    (``_src/mpi_utils.py:36-41``); XLA needs device-even shards, so here
    every tensor's leading axis is padded up to a device-count multiple
    with copies of its last row and a 0/1 ``row_weights`` vector makes the
    padding semantically absent (every loss and the analytic scale weight
    by it).  Each process contributes only its own chunk of the PADDED
    layout.  Returns ``(padded_sharded_tensors, sharded_row_weights)``.
    """
    batch = int(np.asarray(tensors[0]).shape[0])
    n = mesh.devices.size
    padded = -(-batch // n) * n
    pad = padded - batch

    def pad_one(t):
        t = np.asarray(t)
        if pad:
            t = np.concatenate([t] + [t[-1:]] * pad, axis=0)
        return shard_global(t, mesh, axis_name)

    out = type(tensors)(pad_one(t) for t in tensors)
    weights = (np.arange(padded) < batch).astype(np.float64)
    return out, shard_global(weights, mesh, axis_name)


def gather_global(x) -> np.ndarray:
    """Materialize a (possibly sharded) array on the host — the analogue of
    the reference's test-only allgather (``_consistent_unchunk_tensor``)."""
    return np.asarray(jax.device_get(x))
