"""Distributed exact KNN over sharded training data.

The reference's KNN is explicitly NOT distributed — the index lives on MPI
rank 0 and results are scattered (reference README.md:95-97; SURVEY.md §2.12).
When the training set itself is sharded across devices (million-scale sky
points, BASELINE config 5), that design runs out of host memory.

Here every device holds a shard of the training features and computes a
*local* top-k for all queries (MXU distance tiles); the per-device candidate
sets (k each) are all-gathered over ICI and merged with one final top-k.
Communication is ``O(devices * queries * k)`` — independent of train size.
Local indices are translated to global row numbers assuming equal-sized
contiguous shards (the ``shard`` layout of :mod:`muygpys_tpu.parallel`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_knn(
    train_sharded: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    mesh: Mesh,
    axis_name: str = "batch",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global KNN with the train rows sharded over ``mesh``.

    Args:
        train_sharded: ``(train_count, feat)`` array placed with its leading
            axis sharded over the mesh (``parallel.shard``); train_count must
            divide evenly by the mesh size.
        queries: ``(query_count, feat)`` array (replicated).
        nn_count: neighbors per query.

    Returns:
        ``(indices, sq_dists)`` with *global* train row indices, ascending
        by distance.
    """
    n_dev = mesh.devices.size
    train_count = train_sharded.shape[0]
    if train_count % n_dev != 0:
        raise ValueError(
            f"train_count {train_count} must divide the mesh size {n_dev}"
        )
    shard_rows = train_count // n_dev

    def local_part(train_local, q):
        # local exact top-k on this device's shard
        d2 = (
            jnp.sum(q * q, axis=-1)[:, None]
            + jnp.sum(train_local * train_local, axis=-1)[None, :]
            - 2.0
            * jnp.matmul(
                q, train_local.T, precision=jax.lax.Precision.HIGHEST
            )
        )
        negd, idx = jax.lax.top_k(-d2, nn_count)
        my_shard = jax.lax.axis_index(axis_name)
        global_idx = idx + my_shard * shard_rows
        # gather every device's candidates: (n_dev, q, k)
        all_negd = jax.lax.all_gather(negd, axis_name)
        all_idx = jax.lax.all_gather(global_idx, axis_name)
        q_count = q.shape[0]
        cand_negd = jnp.transpose(all_negd, (1, 0, 2)).reshape(
            q_count, n_dev * nn_count
        )
        cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(
            q_count, n_dev * nn_count
        )
        negd_f, sel = jax.lax.top_k(cand_negd, nn_count)
        idx_f = jnp.take_along_axis(cand_idx, sel, axis=1)
        return idx_f, jnp.maximum(-negd_f, 0.0)

    fn = shard_map(
        local_part,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(), P()),
        # outputs are replicated by construction (all_gather + identical
        # merge on every device), which the checker cannot infer statically
        check_vma=False,
    )
    return fn(train_sharded, queries)
