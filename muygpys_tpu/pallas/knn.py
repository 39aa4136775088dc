"""Pallas TPU kernel: fused brute-force KNN candidate selection.

The XLA million-scale KNN path (:func:`muygpys_tpu.neighbors
._brute_force_knn_scan`) computes a ``(query_tile, train_tile)`` distance
block with one MXU matmul, then selects per-tile candidates with
``lax.approx_min_k``.  ``approx_min_k`` lowers to a PartialReduce *custom
call*, so XLA cannot fuse the matmul into it: every distance block round
trips HBM (32 MB per (512, 16384) f32 tile) on a path whose useful output
is ~100 candidates per query.  ``lax.top_k`` does not lower in Mosaic at
all (PERF.md r1), so the fix is a from-scratch selection network.

This kernel keeps the distance block entirely in VMEM and replaces top-k
with **two-minima-per-residue-bin selection** — the same statistical design
as PartialReduce, held as running state across the train-tile grid axis:

- train columns are binned by residue ``col % bins``;
- for each bin the kernel tracks the two smallest distances seen (and
  their global train indices) across ALL train tiles (the output block is
  revisited on the sequential train-tile grid axis, so it acts as a VMEM
  accumulator — nothing is written to HBM until the query tile finishes);
- the host-side merge is one ``lax.top_k`` over the ``2 * bins`` surviving
  candidates per query, followed by the caller's exact re-rank
  (:func:`muygpys_tpu.neighbors._refine_knn`).

Recall: a true neighbor is lost only when >= 3 of the true top-k collide
in one residue bin.  For k = 50, bins = 1024: expected losses per query
~ C(50,3)/1024^2 ~= 0.02 — and the candidate over-fetch + exact re-rank
absorbs rank noise exactly as the XLA path does.

HBM traffic per query tile: read train once + write ``4 * (TQ, bins)``
words — the O(query * train) distance field never leaves VMEM.

Reference replaced: sklearn ball_tree / hnswlib index structures
(reference ``neighbors.py:107-120``) — on TPU, fused brute force beats
host index structures for the <= ~1e6-point regime (PERF.md).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_body(bins, q_ref, tT_ref, tsq_ref, d1_ref, i1_ref, d2_ref, i2_ref):
    j = pl.program_id(1)
    tq = q_ref.shape[0]
    tt = tT_ref.shape[1]

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full((tq, bins), jnp.inf, jnp.float32)
        d2_ref[:] = jnp.full((tq, bins), jnp.inf, jnp.float32)
        i1_ref[:] = jnp.zeros((tq, bins), jnp.int32)
        i2_ref[:] = jnp.zeros((tq, bins), jnp.int32)

    q = q_ref[:]  # (TQ, f)
    qsq = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)
    # (TQ, TT) distance block: one MXU matmul, lives only in VMEM.
    # HIGHEST precision is load-bearing: the TPU f32 matmul default is
    # bf16 multi-pass (~1e-2 relative), which scrambles neighbor ranking
    # (same pitfall as neighbors._get_nns documents).
    dfull = qsq + tsq_ref[:] - 2.0 * jnp.dot(
        q,
        tT_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)
    base = j * tt
    for g in range(tt // bins):
        blk = dfull[:, g * bins:(g + 1) * bins]  # (TQ, bins)
        gidx = col + (base + g * bins)
        b1, x1 = d1_ref[:], i1_ref[:]
        b2, x2 = d2_ref[:], i2_ref[:]
        lt1 = blk < b1
        lt2 = blk < b2
        d1_ref[:] = jnp.where(lt1, blk, b1)
        i1_ref[:] = jnp.where(lt1, gidx, x1)
        # displaced old min1 falls to slot 2; otherwise challenge slot 2
        d2_ref[:] = jnp.where(lt1, b1, jnp.where(lt2, blk, b2))
        i2_ref[:] = jnp.where(lt1, x1, jnp.where(lt2, gidx, x2))


@partial(
    jax.jit,
    static_argnames=(
        "nn_count", "query_tile", "train_tile", "bins", "interpret"
    ),
)
def knn_pallas(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    query_tile: int = 128,
    train_tile: int = 2048,
    bins: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate KNN ``(indices, sq_dists)`` of shape ``(Q, nn_count)``.

    Candidates, not guaranteed-exact neighbors: callers should over-fetch
    (``nn_count = k + slack``) and exactly re-rank, the same discipline as
    the ``approx_min_k`` scan path (``neighbors._get_nns``).
    """
    if train_tile % bins != 0:
        raise ValueError(f"bins {bins} must divide train_tile {train_tile}")
    query_count, feat = queries.shape
    train_count = train.shape[0]

    nt = math.ceil(train_count / train_tile)
    t_padded = nt * train_tile
    train_pad = jnp.pad(
        train.astype(jnp.float32), ((0, t_padded - train_count), (0, 0))
    )
    tsq = jnp.sum(train_pad * train_pad, axis=-1)
    # +inf norm on padded rows keeps them out of every bin minimum
    tsq = jnp.where(jnp.arange(t_padded) < train_count, tsq, jnp.inf)

    nq = math.ceil(query_count / query_tile)
    q_padded = nq * query_tile
    q_pad = jnp.pad(
        queries.astype(jnp.float32), ((0, q_padded - query_count), (0, 0))
    )

    grid = (nq, nt)
    kernel = partial(_knn_body, bins)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (query_tile, feat), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (feat, train_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, train_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (query_tile, bins), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_padded, bins), jnp.float32),
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
            jax.ShapeDtypeStruct((q_padded, bins), jnp.float32),
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_pad, train_pad.T, tsq[None, :])

    cand_d = jnp.concatenate([d1, d2], axis=1)  # (Q, 2*bins)
    cand_i = jnp.concatenate([i1, i2], axis=1)
    k = min(nn_count, 2 * bins)
    negd, sel = jax.lax.top_k(-cand_d, k)
    idx = jnp.take_along_axis(cand_i, sel, axis=1)
    return (
        idx[:query_count],
        jnp.maximum(-negd, 0.0)[:query_count],
    )
