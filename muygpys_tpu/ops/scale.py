"""Analytic sigma^2 (variance scale) estimation.

Parity surface of ``_src/optimize/scale/{numpy,jax}.py``:
``_analytic_scale_optim`` (jax.py:22-56) with univariate/flattened-multivariate
handling, plus the unnormalized variant used by downsampling.

sigma^2 = (1/(b*n)) sum_i Y_i^T (Kin_i + eps)^{-1} Y_i, computed via one
batched Cholesky: ``y^T K^{-1} y = |L^{-1} y|^2``.

For sharded batches pass ``batch_count_global`` so normalization uses the
global count (the reference MPI backend allreduces both the numerator and the
batch count, ``_src/optimize/scale/mpi.py:20-38``); the sum itself lowers to a
psum under a sharded batch axis.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def _flatten(Kin: jnp.ndarray, nn_targets: jnp.ndarray):
    if Kin.ndim == 3:
        y = nn_targets if nn_targets.ndim == 3 else nn_targets[:, :, None]
        return Kin, y, Kin.shape[1]
    elif Kin.ndim == 5:
        b, in_count, nn_count = Kin.shape[:3]
        all_count = in_count * nn_count
        return (
            Kin.reshape(b, all_count, all_count),
            nn_targets.reshape(b, all_count, 1),
            nn_count,
        )
    raise ValueError(f"unsupported Kin shape {Kin.shape} for scale optim")


def analytic_scale_optim_unnormalized(
    Kin: jnp.ndarray, nn_targets: jnp.ndarray, row_weights=None, **kwargs
) -> jnp.ndarray:
    if nn_targets.ndim == 2:
        nn_targets = nn_targets[:, :, None]
    L = lax.linalg.cholesky(Kin)
    W = solve_triangular(L, nn_targets, lower=True)
    terms = W * W
    if row_weights is not None:
        terms = terms * jnp.asarray(row_weights, terms.dtype).reshape(
            -1, 1, 1
        )
    return jnp.sum(terms)


def analytic_scale_optim(
    Kin: jnp.ndarray,
    nn_targets: jnp.ndarray,
    batch_count_global: Optional[float] = None,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    """sigma^2 = numerator / (batch_count_global * nn_count).

    ``row_weights`` (0/1 per row) masks padded rows out of the numerator.
    When it is supplied and ``batch_count_global`` is left ``None``, the
    denominator count is ``sum(row_weights)`` — under jit over a sharded
    batch axis that sum lowers to the global (psum'd) weight total, which
    is the reference MPI semantics (``_src/optimize/scale/mpi.py:20-38``).

    Contract when BOTH are supplied (per-shard ``shard_map``-style callers
    that cannot rely on a sharded global sum): ``batch_count_global`` must
    equal the GLOBAL sum of ``row_weights`` across all shards — i.e. the
    unpadded global batch count — not the raw padded batch size, or the
    ragged-tail rows get double-discounted.
    """
    Kin_flat, y_flat, nn_count = _flatten(Kin, nn_targets)
    if batch_count_global is None:
        if row_weights is not None:
            # 0/1 weights make padded rows absent from numerator AND count
            # (ragged sharding, parallel.sharding.shard_ragged)
            batch_count_global = jnp.sum(
                jnp.asarray(row_weights, Kin.dtype)
            )
        else:
            batch_count_global = Kin.shape[0]
    return analytic_scale_optim_unnormalized(
        Kin_flat, y_flat, row_weights=row_weights
    ) / (batch_count_global * nn_count)
