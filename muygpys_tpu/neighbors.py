"""Nearest neighbor index.

API parity: reference ``neighbors.py:32`` (``NN_Wrapper``: ``get_nns`` :129,
``get_batch_nns`` :169 — drops the self neighbor; distances returned are
*squared* l2, matching hnswlib's F2 convention which the reference's exact
path emulates, ``neighbors.py:246-250``).

TPU-native redesign: the default ``"exact"`` method is an **on-device
brute-force top-k** — distance tiles computed via the Gram identity on the
MXU, reduced with ``lax.top_k``, queries processed in fixed-size chunks under
``lax.map`` so one compiled program serves any query count (padded).  This
replaces the reference's host-side C++ (sklearn ball_tree / hnswlib) with
device compute: for the n <= ~1e6 regime a TPU chip brute-forces faster than
host index structures can be built, and results are exact.

Host-side methods remain available: ``"sklearn"`` (exact, ball_tree) and
``"hnsw"`` (approximate, if hnswlib is installed).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_QUERY_TILE = 512


_TRAIN_TILE = 16384


@partial(jax.jit, static_argnames=("nn_count", "query_tile"))
def _brute_force_knn(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    query_tile: int = _QUERY_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k smallest squared-l2 distances, tiled over queries.

    Returns ``(indices, sq_dists)`` of shape ``(query_count, nn_count)``.
    The query axis is padded up to a tile multiple so the per-tile program is
    compiled once; the train Gram norms are computed once and closed over.
    """
    query_count = queries.shape[0]
    train_sq = jnp.sum(train * train, axis=-1)  # (n,)
    tile_count = math.ceil(query_count / query_tile)
    padded = tile_count * query_tile
    q_pad = jnp.pad(queries, ((0, padded - query_count), (0, 0)))
    q_tiles = q_pad.reshape(tile_count, query_tile, -1)

    def one_tile(q):
        # (t, n) distance tile via MXU matmul
        d2 = (
            jnp.sum(q * q, axis=-1)[:, None]
            + train_sq[None, :]
            - 2.0
            * jnp.matmul(q, train.T, precision=jax.lax.Precision.HIGHEST)
        )
        neg_vals, idx = jax.lax.top_k(-d2, nn_count)
        return idx, jnp.maximum(-neg_vals, 0.0)

    idx, d2 = jax.lax.map(one_tile, q_tiles)
    idx = idx.reshape(padded, nn_count)[:query_count]
    d2 = d2.reshape(padded, nn_count)[:query_count]
    return idx, d2


@partial(
    jax.jit, static_argnames=("nn_count", "query_tile", "train_tile")
)
def _brute_force_knn_scan(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    nn_count: int,
    query_tile: int = _QUERY_TILE,
    train_tile: int = _TRAIN_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Million-scale KNN: scan over train tiles with a running top-k.

    Never materializes more than a ``(query_tile, train_tile)`` distance
    block, so memory is O(tile^2) regardless of train size — the scalable
    path for BASELINE config 5 (million-scale sky points).  Per-tile
    candidates are selected with ``lax.approx_min_k`` (TPU PartialReduce —
    measured 19x faster than the sort-based exact ``top_k``) and merged with
    a small exact top-k; callers re-rank exactly afterwards (``_refine_knn``)
    so results are exact up to the per-tile approximate recall (~0.95+ at the
    candidate boundary, ~1.0 after the +32 over-fetch).
    """
    query_count, feat = queries.shape
    train_count = train.shape[0]

    t_tiles = math.ceil(train_count / train_tile)
    t_padded = t_tiles * train_tile
    # pad with +inf norms so padded rows never enter the top-k
    train_pad = jnp.pad(train, ((0, t_padded - train_count), (0, 0)))
    train_sq = jnp.sum(train_pad * train_pad, axis=-1)
    train_sq = jnp.where(
        jnp.arange(t_padded) < train_count, train_sq, jnp.inf
    )
    train_tiles = train_pad.reshape(t_tiles, train_tile, feat)
    sq_tiles = train_sq.reshape(t_tiles, train_tile)

    q_tiles_count = math.ceil(query_count / query_tile)
    q_padded = q_tiles_count * query_tile
    q_pad = jnp.pad(queries, ((0, q_padded - query_count), (0, 0)))
    q_tiles = q_pad.reshape(q_tiles_count, query_tile, feat)

    def one_query_tile(q):
        q_sq = jnp.sum(q * q, axis=-1)[:, None]

        def step(carry, tile):
            best_negd, best_idx = carry
            t_feat, t_sq, t_base = tile
            d2 = q_sq + t_sq[None, :] - 2.0 * jnp.matmul(
                q, t_feat.T, precision=jax.lax.Precision.HIGHEST
            )
            # hardware-accelerated per-tile candidate selection
            tile_d, tile_local = jax.lax.approx_min_k(d2, nn_count)
            cand_negd = jnp.concatenate([best_negd, -tile_d], axis=1)
            cand_idx = jnp.concatenate(
                [best_idx, t_base + tile_local.astype(jnp.int32)], axis=1
            )
            # small exact merge over 2*nn_count lanes
            negd, sel = jax.lax.top_k(cand_negd, nn_count)
            idx = jnp.take_along_axis(cand_idx, sel, axis=1)
            return (negd, idx), None

        init = (
            jnp.full((query_tile, nn_count), -jnp.inf),
            jnp.zeros((query_tile, nn_count), jnp.int32),
        )
        bases = (jnp.arange(t_tiles) * train_tile).astype(jnp.int32)
        (negd, idx), _ = jax.lax.scan(
            step, init, (train_tiles, sq_tiles, bases)
        )
        return idx, jnp.maximum(-negd, 0.0)

    idx, d2 = jax.lax.map(one_query_tile, q_tiles)
    idx = idx.reshape(q_padded, nn_count)[:query_count]
    d2 = d2.reshape(q_padded, nn_count)[:query_count]
    return idx, d2


@partial(jax.jit, static_argnames=("nn_count",))
def _refine_knn(
    train: jnp.ndarray,
    queries: jnp.ndarray,
    cand_idx: jnp.ndarray,
    nn_count: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact re-rank of candidate neighbors by direct squared differences."""
    cand = train[cand_idx]  # (q, kc, f)
    d2 = jnp.sum((queries[:, None, :] - cand) ** 2, axis=-1)
    negd, sel = jax.lax.top_k(-d2, nn_count)
    idx = jnp.take_along_axis(cand_idx, sel, axis=1)
    return idx, jnp.maximum(-negd, 0.0)


class NN_Wrapper:
    """KNN index over the training features.

    Args:
        train: ``(train_count, feature_count)`` training features.
        nn_count: number of neighbors returned per query.
        nn_method: ``"exact"`` (on-device brute force, default), ``"brute"``
            (alias), ``"pallas"`` (on-device fused candidate kernel — the
            distance field never leaves VMEM, :mod:`muygpys_tpu.pallas.knn`;
            TPU only), ``"sklearn"`` (host exact), or ``"hnsw"`` (host
            approximate; requires hnswlib).
    """

    def __init__(
        self,
        train,
        nn_count: int,
        nn_method: str = "exact",
        **kwargs,
    ):
        train = np.asarray(train)
        if train.ndim == 1:
            train = train[:, None]
        self.train = train
        self.train_count, self.feature_count = train.shape
        self.nn_count = nn_count
        self.nn_method = nn_method.lower()
        if self.nn_method in ("exact", "brute", "pallas"):
            self._train_dev = jnp.asarray(train)
            # spatial pruning for the candidate kernel: Morton-sort a copy
            # of the training rows so provably irrelevant (query, train)
            # tile blocks are skipped — 3.9x at 1M rows, identical
            # candidates (muygpys_tpu/pallas/knn.py, PERF.md r3).  Auto on
            # for low-dimensional data; kernel indices map back through
            # the permutation so callers always see original row numbers.
            spatial = kwargs.get("spatial_sort")
            if spatial is None:
                spatial = self.feature_count <= 4
            self._spatial = (
                bool(spatial)
                and self.nn_method == "pallas"
                and self.train_count >= 2048
            )
            if self._spatial:
                from muygpys_tpu.pallas.knn import spatial_sort

                self._perm_dev = jnp.asarray(
                    np.asarray(spatial_sort(train))
                )
                self._train_sorted = self._train_dev[self._perm_dev]
        elif self.nn_method == "sklearn":
            from sklearn.neighbors import NearestNeighbors

            exact_kwargs = {
                k: kwargs[k]
                for k in kwargs
                if k in {"radius", "algorithm", "leaf_size", "metric", "p",
                         "metric_params", "n_jobs"}
            }
            self.nbrs = NearestNeighbors(
                n_neighbors=nn_count, **exact_kwargs
            ).fit(train)
        elif self.nn_method == "hnsw":
            # in-tree C++ HNSW (muygpys_tpu/native/hnsw.cpp) — replaces the
            # reference's external hnswlib dependency
            from muygpys_tpu.native import HNSW

            index_kwargs = {
                k: kwargs[k]
                for k in kwargs
                if k in {"max_elements", "ef_construction", "M",
                         "random_seed"}
            }
            index_kwargs.setdefault("max_elements", self.train_count)
            self.nbrs = HNSW(self.feature_count, **index_kwargs)
            self.nbrs.add_items(train)
        else:
            raise NotImplementedError(
                f"selected nn_method {nn_method} is not implemented"
            )

    def get_nns(self, test) -> Tuple[np.ndarray, np.ndarray]:
        """Neighbors of out-of-sample queries: ``(indices, sq_dists)``."""
        return self._get_nns(test, self.nn_count)

    def get_batch_nns(
        self, batch_indices
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Neighbors of training points, self-neighbor dropped."""
        batch_indices = np.asarray(batch_indices)
        nn_indices, nn_dists = self._get_nns(
            self.train[batch_indices], self.nn_count + 1
        )
        return nn_indices[:, 1:], nn_dists[:, 1:]

    def _get_nns(self, test, nn_count: int):
        test = np.asarray(test)
        if test.ndim == 1:
            test = test[:, None]
        if self.nn_method in ("exact", "brute", "pallas"):
            # over-fetch via the MXU Gram-identity path, then re-rank the
            # candidates with exact differences: the |a|^2+|b|^2-2ab identity
            # loses ~eps*|a|^2 absolute precision in f32, which scrambles
            # ranking once true nearest distances approach that noise floor
            # (dense million-point sets)
            cand_count = min(nn_count + 32, self.train_count)
            queries = jnp.asarray(test)
            if self.nn_method == "pallas" and self.train_count >= 2048:
                from muygpys_tpu.pallas.knn import (
                    knn_pallas,
                    knn_pallas_pruned,
                )

                # 1024 bins: the host KNN API favors recall over the merge
                # cost (the serving path uses the faster 512-bin default).
                # Guarded on train_count >= 2*bins: below that the kernel's
                # candidate slots cannot all hold distinct real columns
                # (duplicate indices possible, muygpys_tpu/pallas/knn.py)
                # and single-tile exact brute force is faster anyway.
                if self._spatial:
                    cand_s, _ = knn_pallas_pruned(
                        self._train_sorted, queries, cand_count, bins=1024
                    )
                    cand_idx = self._perm_dev[cand_s]
                else:
                    cand_idx, _ = knn_pallas(
                        self._train_dev, queries, cand_count, bins=1024
                    )
            elif self.train_count > _TRAIN_TILE:
                cand_idx, _ = _brute_force_knn_scan(
                    self._train_dev, queries, cand_count
                )
            else:
                cand_idx, _ = _brute_force_knn(
                    self._train_dev, queries, cand_count
                )
            idx, d2 = _refine_knn(
                self._train_dev, queries, cand_idx, nn_count
            )
            return np.asarray(idx), np.asarray(d2)
        elif self.nn_method == "sklearn":
            dists, idx = self.nbrs.kneighbors(test, n_neighbors=nn_count)
            return idx, dists**2  # match hnsw's squared-l2 convention
        else:
            idx, d2 = self.nbrs.knn_query(test, k=nn_count)
            return idx, d2.astype(np.float64)
