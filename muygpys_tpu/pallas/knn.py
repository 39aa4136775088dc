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
as PartialReduce, held as running state across the train-tile grid axis
(the output block is revisited on the sequential inner grid axis, so it
acts as a VMEM accumulator; nothing is written to HBM until the query tile
finishes):

- train columns are binned by residue ``col % bins``;
- each bin tracks its two smallest **packed keys**.  A key is the f32
  squared distance, clamped non-negative, with its low mantissa bits
  replaced by the column's *chunk number* (``col // bins``).  Non-negative
  IEEE floats order like their bit patterns, so the whole two-slot update
  is three integer min/max ops per element — and the candidate's train
  index decodes *algebraically* from (merge position, key low bits).  No
  index arrays in VMEM, and — decisive — no ``take_along_axis`` gather on
  the host side: an (8192, 2048) row gather measured ~10.5 ms on v5e,
  2.3x the entire kernel (PERF.md r2).
- the host-side merge is one ``lax.approx_min_k`` over the ``2 * bins``
  surviving keys per query (an exact ``lax.top_k`` here is a full per-row
  sort and costs more than the kernel), then the caller's exact re-rank
  (:func:`muygpys_tpu.neighbors._refine_knn`) restores exact distances
  and order.

Recall: a true neighbor is lost only when >= 3 of the true top-k collide
in one residue bin.  For k = 50, bins = 1024: expected losses per query
~ C(50,3)/1024^2 ~= 0.02 — and the candidate over-fetch + exact re-rank
absorbs boundary noise exactly as the XLA path does.  Truncating the low
``chunk_bits`` mantissa bits costs at most 2^(chunk_bits-23) relative
distance resolution among *candidates* (1M points, 1024 bins -> 10 bits
-> 2^-13), invisible after the exact re-rank.

HBM traffic per query tile: read train once + write ``2 * (TQ, bins)``
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

# init sentinel: 2^127 (huge finite, zero mantissa -> zero chunk bits);
# padded train columns get ~1e30 norms, also never selected
_INIT_KEY_BITS = 0x7F000000


def _knn_tile_update(bins, chunk_mask, j, q_ref, tT_ref, tsq_ref, s1_ref, s2_ref):
    """One (query_tile, train_tile) distance block folded into the running
    per-residue-bin two-minima state.  ``j`` is the train-tile grid index,
    passed in because ``pl.program_id`` cannot be read inside a ``pl.when``
    branch (the interpret-mode cond traces it outside the kernel)."""
    tt = tT_ref.shape[1]
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
    dfull = jnp.maximum(dfull, 0.0)  # keep keys non-negative (bit ordering)

    chunks_per_tile = tt // bins
    for g in range(chunks_per_tile):
        blk = dfull[:, g * bins:(g + 1) * bins]  # (TQ, bins)
        chunk_id = j * chunks_per_tile + g
        key = (
            jax.lax.bitcast_convert_type(blk, jnp.int32) & ~chunk_mask
        ) | chunk_id
        s1 = s1_ref[:]
        # two smallest of {key, s1, s2} = (min, median); three int ops
        s1_ref[:] = jnp.minimum(key, s1)
        s2_ref[:] = jnp.minimum(jnp.maximum(key, s1), s2_ref[:])


def _knn_body(bins, chunk_mask, q_ref, tT_ref, tsq_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    tq = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        s1_ref[:] = jnp.full((tq, bins), _INIT_KEY_BITS, jnp.int32)
        s2_ref[:] = jnp.full((tq, bins), _INIT_KEY_BITS, jnp.int32)

    _knn_tile_update(
        bins, chunk_mask, j, q_ref, tT_ref, tsq_ref, s1_ref, s2_ref
    )


def _knn_body_pruned(
    bins, chunk_mask, lb_ref, ub_ref, q_ref, tT_ref, tsq_ref, s1_ref, s2_ref
):
    """Spatially pruned variant: the (query_tile, train_tile) block is
    skipped entirely when the bounding-box lower bound exceeds the query
    tile's k-th-neighbor upper bound.  The kernel is VPU-bound
    (PERF.md r3 stage decomposition), so a skipped block saves its full
    compute cost even though its DMA still lands."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tq = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        s1_ref[:] = jnp.full((tq, bins), _INIT_KEY_BITS, jnp.int32)
        s2_ref[:] = jnp.full((tq, bins), _INIT_KEY_BITS, jnp.int32)

    # lb/ub ride in SMEM blocks of 8 query-tile rows (Mosaic requires
    # sublane-dim blocks divisible by 8); this grid step's row is i % 8
    @pl.when(lb_ref[i % 8, j] <= ub_ref[i % 8, 0])
    def _():
        _knn_tile_update(
            bins, chunk_mask, j, q_ref, tT_ref, tsq_ref, s1_ref, s2_ref
        )


@partial(
    jax.jit,
    static_argnames=(
        "nn_count", "query_tile", "train_tile", "bins", "merge_recall",
        "interpret",
    ),
)
def knn_pallas(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    query_tile: int = 128,
    train_tile: int = 2048,
    bins: int = 512,
    merge_recall: float = 0.99,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate KNN ``(indices, sq_dists)`` of shape ``(Q, nn_count)``.

    Candidates, not guaranteed-exact neighbors; returned distances carry
    the packed-key truncation (<= 2^(chunk_bits-23) relative) and are not
    guaranteed sorted (the merge is an approximate partial reduction).
    Callers should over-fetch (``nn_count = k + slack``) and exactly
    re-rank, the same discipline as the ``approx_min_k`` scan path
    (``neighbors._get_nns``).

    Degenerate regime: when ``train_count < 2 * bins`` some bin slots
    cannot be filled with distinct real columns, so surviving sentinel /
    padded keys are returned with ``+inf`` distance and an in-range (but
    possibly duplicate) index.  Callers wanting distinct neighbors at that
    scale should use an exact engine (single-tile brute force is faster
    there anyway); ``nn_count > 2 * bins`` raises, since the kernel retains
    at most two candidates per residue bin.
    """
    if train_tile % bins != 0:
        raise ValueError(f"bins {bins} must divide train_tile {train_tile}")
    if nn_count > 2 * bins:
        # the running state holds exactly two candidates per residue bin, so
        # 2*bins is a hard ceiling on distinct survivors — silently clamping
        # would hand the caller a truncated candidate set
        raise ValueError(
            f"nn_count {nn_count} exceeds the 2*bins={2 * bins} candidates "
            "the kernel retains; raise bins or use an exact engine"
        )
    query_count, feat = queries.shape
    train_count = train.shape[0]

    nt = math.ceil(train_count / train_tile)
    t_padded = nt * train_tile
    total_chunks = t_padded // bins
    chunk_bits = max(1, math.ceil(math.log2(total_chunks)))
    if chunk_bits > 14:
        raise ValueError(
            f"{train_count} train points need {chunk_bits} chunk bits at "
            f"bins={bins}; > 14 bits erodes candidate resolution — raise "
            "bins or shard the train set"
        )
    chunk_mask = (1 << chunk_bits) - 1

    train_pad = jnp.pad(
        train.astype(jnp.float32), ((0, t_padded - train_count), (0, 0))
    )
    tsq = jnp.sum(train_pad * train_pad, axis=-1)
    # huge-but-finite norm keeps padded rows out of every bin minimum
    # (+inf would turn into NaN once chunk bits are OR'ed into the key)
    tsq = jnp.where(
        jnp.arange(t_padded) < train_count, tsq, jnp.float32(1e30)
    )

    nq = math.ceil(query_count / query_tile)
    q_padded = nq * query_tile
    q_pad = jnp.pad(
        queries.astype(jnp.float32), ((0, q_padded - query_count), (0, 0))
    )

    grid = (nq, nt)
    kernel = partial(_knn_body, bins, chunk_mask)
    s1, s2 = pl.pallas_call(
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
            for _ in range(2)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_pad, train_pad.T, tsq[None, :])

    return _merge_decode(
        s1, s2, nn_count, bins, chunk_mask, train_count, query_count,
        merge_recall,
    )


def _merge_decode(
    s1, s2, nn_count, bins, chunk_mask, train_count, query_count,
    merge_recall,
):
    # merge via approx_min_k (TPU PartialReduce): an exact lax.top_k here
    # is a full per-row sort of 2*bins lanes and dominated the whole query
    # (~10 ms of a 16.5 ms batch at Q=8192, bins=1024); the approximate
    # merge's boundary loss is absorbed by the caller's over-fetch + exact
    # re-rank, like the per-tile selection itself
    keys = jax.lax.bitcast_convert_type(
        jnp.concatenate([s1, s2], axis=1), jnp.float32
    )  # (Q, 2*bins), non-negative: float order == stored int order
    k = min(nn_count, 2 * bins)
    # the merge's own PartialReduce recall (default 0.95) was the measured
    # dominant neighbor-loss term — the kernel's bin-collision losses are
    # ~10x smaller; 0.99 costs ~nothing at 2*bins inputs
    vals, sel = jax.lax.approx_min_k(keys, k, recall_target=merge_recall)
    # algebraic decode — no gather: bin = merge position mod bins, chunk =
    # low key bits, column = chunk * bins + bin
    vbits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    idx = (vbits & chunk_mask) * bins + (sel % bins)
    d2 = jax.lax.bitcast_convert_type(vbits & ~chunk_mask, jnp.float32)
    # sentinel (never-filled slot, 2^127) and padded-column (~1e30 norm)
    # keys can survive the merge when train_count < 2*bins leaves bin slots
    # unfillable (or, rarely, via merge-recall leakage): flag them with an
    # +inf distance so callers can mask, and clamp the decoded index into
    # range so downstream gathers stay legal.  In this regime the candidate
    # list may repeat a training index — callers that need distinct
    # neighbors must over-fetch and re-rank (the in-tree callers fall back
    # to the exact engines for small train sets instead).
    invalid = d2 >= jnp.float32(1e29)
    d2 = jnp.where(invalid, jnp.float32(jnp.inf), d2)
    idx = jnp.minimum(idx, train_count - 1)
    return idx[:query_count], d2[:query_count]


def _morton_codes(pts: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Morton (Z-order) codes: per-dim quantization + bit interleave.

    Low-dimensional spatial data only (the serving sweet spot: sky
    coordinates, spatial fields).  ``bits`` is capped so codes fit 30 bits.
    """
    pts = jnp.asarray(pts, jnp.float32)
    d = pts.shape[1]
    bits = min(bits, 30 // d)
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    scale = (2.0**bits - 1.0) / jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((pts - lo) * scale, 0.0, 2.0**bits - 1.0).astype(jnp.int32)
    code = jnp.zeros(pts.shape[0], jnp.int32)
    for b in range(bits):
        for dim in range(d):
            code = code | (((q[:, dim] >> b) & 1) << (b * d + dim))
    return code


def spatial_sort(pts) -> jnp.ndarray:
    """Permutation ordering points along a Morton curve.

    Sort the training set with this before :func:`knn_pallas_pruned` so
    that train tiles are spatially compact (tight bounding boxes -> more
    tiles pruned)."""
    return jnp.argsort(_morton_codes(jnp.asarray(pts)))


def _tile_bboxes(pts_padded: jnp.ndarray, tile: int):
    """(n_tiles, d) per-tile bounding boxes of a padded point array."""
    nt = pts_padded.shape[0] // tile
    r = pts_padded.reshape(nt, tile, pts_padded.shape[1])
    return jnp.min(r, axis=1), jnp.max(r, axis=1)


def _bbox_lb2(qlo, qhi, tlo, thi) -> jnp.ndarray:
    """Squared bbox-to-bbox distance lower bound: (nq_tiles, nt_tiles)."""
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            tlo[None, :, :] - qhi[:, None, :],
            qlo[:, None, :] - thi[None, :, :],
        ),
    )
    return jnp.sum(gap * gap, axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "nn_count", "query_tile", "train_tile", "bins", "merge_recall",
        "subsample", "interpret",
    ),
)
def knn_pallas_pruned(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    query_tile: int = 128,
    train_tile: int = 2048,
    bins: int = 512,
    merge_recall: float = 0.99,
    subsample: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatially pruned candidate KNN: same contract as :func:`knn_pallas`
    but skips (query_tile, train_tile) blocks whose bounding boxes are
    provably farther than the query tile's k-th-neighbor upper bound.

    ``train`` must be Morton-sorted (:func:`spatial_sort`) for the
    train-tile bounding boxes to be tight; queries are sorted internally
    and results mapped back, so the caller sees the ordinary layout.
    Returned indices address the (sorted) ``train`` array passed in.

    The pruning is conservative — a skipped tile provably contains no true
    k-nearest neighbor, so candidate quality is identical to
    :func:`knn_pallas` up to the shared merge approximation:

    - the upper bound is the max candidate distance on a ``1/subsample``
      row subset (a k-NN distance on a subset can only be farther than on
      the full set), inflated by the packed-key truncation bound;
    - the lower bound is the exact bbox-to-bbox squared distance.

    The kernel is VPU-bound, so skipped blocks save their full compute
    cost; at 1M uniform-2D rows ~90% of blocks prune (PERF.md r3).
    """
    if train_tile % bins != 0:
        raise ValueError(f"bins {bins} must divide train_tile {train_tile}")
    if nn_count > 2 * bins:
        raise ValueError(
            f"nn_count {nn_count} exceeds the 2*bins={2 * bins} candidates "
            "the kernel retains; raise bins or use an exact engine"
        )
    query_count, feat = queries.shape
    train_count = train.shape[0]

    nt = math.ceil(train_count / train_tile)
    t_padded = nt * train_tile
    total_chunks = t_padded // bins
    chunk_bits = max(1, math.ceil(math.log2(total_chunks)))
    if chunk_bits > 14:
        raise ValueError(
            f"{train_count} train points need {chunk_bits} chunk bits at "
            f"bins={bins}; > 14 bits erodes candidate resolution — raise "
            "bins or shard the train set"
        )
    chunk_mask = (1 << chunk_bits) - 1

    # edge-pad (not zero-pad): padded rows must not widen the last tile's
    # bounding box; the 1e30 sentinel norm still excludes them as columns
    train = train.astype(jnp.float32)
    pad_t = t_padded - train_count
    train_pad = jnp.concatenate(
        [train] + ([jnp.repeat(train[-1:], pad_t, axis=0)] if pad_t else []),
        axis=0,
    )
    tsq = jnp.sum(train_pad * train_pad, axis=-1)
    tsq = jnp.where(
        jnp.arange(t_padded) < train_count, tsq, jnp.float32(1e30)
    )

    # sort queries along the same curve so query tiles are compact too
    qperm = jnp.argsort(_morton_codes(queries))
    qs = jnp.asarray(queries, jnp.float32)[qperm]
    nq = math.ceil(query_count / query_tile)
    q_padded = nq * query_tile
    pad_q = q_padded - query_count
    q_pad = jnp.concatenate(
        [qs] + ([jnp.repeat(qs[-1:], pad_q, axis=0)] if pad_q else []),
        axis=0,
    )

    # per-query upper bound on the k-th neighbor distance: max candidate
    # distance on a row subsample (k-th NN of a subset >= k-th NN of the
    # set), inflated past the packed-key mantissa truncation
    _, d2_sub = knn_pallas(
        train[:: subsample], q_pad, nn_count,
        query_tile=query_tile, train_tile=train_tile, bins=bins,
        merge_recall=merge_recall, interpret=interpret,
    )
    ub_row = jnp.max(
        jnp.where(jnp.isfinite(d2_sub), d2_sub, jnp.float32(1e30)), axis=1
    ) * (1.0 + 2.0**-14)
    ub = jnp.max(ub_row.reshape(nq, query_tile), axis=1, keepdims=True)

    qlo, qhi = _tile_bboxes(q_pad, query_tile)
    tlo, thi = _tile_bboxes(train_pad, train_tile)
    lb = _bbox_lb2(qlo, qhi, tlo, thi)  # (nq, nt)

    # SMEM blocks must have sublane-dim multiples of 8: pad the query-tile
    # axis and hand the kernel 8-row blocks (row within block = i % 8)
    nq8 = -(-nq // 8) * 8
    lb = jnp.pad(lb, ((0, nq8 - nq), (0, 0)))
    ub = jnp.pad(ub, ((0, nq8 - nq), (0, 0)))

    grid = (nq, nt)
    kernel = partial(_knn_body_pruned, bins, chunk_mask)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (8, nt), lambda i, j: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, 1), lambda i, j: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
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
            for _ in range(2)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
            jax.ShapeDtypeStruct((q_padded, bins), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lb, ub, q_pad, train_pad.T, tsq[None, :])

    idx_s, d2_s = _merge_decode(
        s1, s2, nn_count, bins, chunk_mask, train_count, q_padded,
        merge_recall,
    )
    # unsort back to the caller's query order
    qinv = jnp.argsort(qperm)
    return idx_s[:query_count][qinv[:query_count]], (
        d2_s[:query_count][qinv[:query_count]]
    )
