"""Neighborhood tensor assembly ops.

Pure JAX functions mirroring the semantic surface of the reference's
``_src/gp/tensors/{numpy,jax}.py`` (see SURVEY.md §2.3), designed for XLA on
TPU:

- All functions are shape-polymorphic at *trace* time only; under ``jit``
  every shape is static, so gathers lower to efficient dynamic-gather HLO and
  everything fuses.
- ``pairwise_F2``/``crosswise_F2`` offer a matmul (MXU) formulation of squared
  distances — ``|a-b|² = |a|² + |b|² - 2 a·b`` — which turns the O(b·n²·f)
  broadcast-subtract (VPU + HBM-bound) into a batched matmul when the feature
  dimension is large.  The isotropic deformation uses these to avoid ever
  materializing the (batch, nn, nn, feat) difference tensor.

Reference parity anchors: ``_crosswise_tensor`` (tensors/numpy.py:47-58),
``_pairwise_tensor`` (:61-69), ``_F2``/``_l2`` (:89-94), ``_fast_nn_update``
(:97-108), ``_make_fast_predict_tensors`` (:18-37), ``_batch_features_tensor``
(:40-44), ``_make_heteroscedastic_tensor`` (:11-15).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _atleast_feature_dim(data: jnp.ndarray) -> jnp.ndarray:
    return data[:, None] if data.ndim == 1 else data


def crosswise_diffs(
    data: jnp.ndarray,
    nn_data: jnp.ndarray,
    data_indices: jnp.ndarray,
    nn_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Feature-wise differences between batch points and their neighbors.

    Returns shape ``(batch, nn, feat)`` (an extra leading axis per extra
    index-tensor dimension is supported, matching the reference).
    """
    data = _atleast_feature_dim(data)
    nn_data = _atleast_feature_dim(nn_data)
    locations = data[data_indices]
    points = nn_data[nn_indices]
    return locations[..., :, None, :] - points


def pairwise_diffs(data: jnp.ndarray, nn_indices: jnp.ndarray) -> jnp.ndarray:
    """Pairwise feature differences within each neighborhood.

    Returns shape ``(batch, nn, nn, feat)``.
    """
    data = _atleast_feature_dim(data)
    points = data[nn_indices]
    return points[..., None, :] - points[..., None, :, :]


def crosswise_differences(
    locations: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Raw point-set crosswise differences: ``(n, m, feat)``."""
    locations = _atleast_feature_dim(locations)
    points = _atleast_feature_dim(points)
    return locations[:, None, :] - points


def pairwise_differences(points: jnp.ndarray) -> jnp.ndarray:
    """Raw point-set pairwise differences."""
    if points.ndim == 1:
        return (points[:, None] - points[None, :])[:, :, None]
    elif points.ndim == 2:
        return points[:, None, :] - points[None, :, :]
    elif points.ndim == 3:
        return points[:, :, None, :] - points[:, None, :, :]
    raise ValueError(f"points shape {points.shape} is not supported")


def F2(diffs: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared differences over the trailing (feature) axis."""
    return jnp.sum(diffs**2, axis=-1)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero (not infinite) gradient at exact zeros.

    Pairwise distance tensors contain exact zeros on their diagonals; when
    gradients flow through distance *assembly* (deep kernel learning), a bare
    ``sqrt`` yields NaN there.  The double-where pattern gives sqrt(0)=0 with
    zero tangent.
    """
    positive = x > 0.0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, x, 1.0)), 0.0)


def l2(diffs: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm over the trailing (feature) axis."""
    return safe_sqrt(F2(diffs))


# --- MXU-friendly distance assembly (no (b, nn, nn, f) materialization) ---


def pairwise_F2(data: jnp.ndarray, nn_indices: jnp.ndarray) -> jnp.ndarray:
    """Squared-l2 pairwise distances per neighborhood, shape (batch, nn, nn).

    Uses the Gram-matrix identity so the inner contraction runs on the MXU:
    ``d²_ij = |x_i|² + |x_j|² - 2 x_i·x_j``.  Clamps tiny negatives from
    cancellation to zero so downstream ``sqrt`` is safe.
    """
    data = _atleast_feature_dim(data)
    points = data[nn_indices]  # (batch, nn, feat) or (nn, feat) for 1-D idx
    sq = jnp.sum(points * points, axis=-1)  # (batch, nn)
    if points.ndim == 2:
        # single neighborhood (e.g. a knot grid): plain Gram matrix
        gram = jnp.matmul(
            points, points.T, precision=jax.lax.Precision.HIGHEST
        )
    else:
        gram = jnp.einsum(
            "bif,bjf->bij",
            points,
            points,
            precision=jax.lax.Precision.HIGHEST,
        )
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def crosswise_F2(
    data: jnp.ndarray,
    nn_data: jnp.ndarray,
    data_indices: jnp.ndarray,
    nn_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Squared-l2 crosswise distances, shape (batch, nn)."""
    data = _atleast_feature_dim(data)
    nn_data = _atleast_feature_dim(nn_data)
    locations = data[data_indices]  # (batch, feat)
    points = nn_data[nn_indices]  # (batch, nn, feat) or shared (nn, feat)
    if points.ndim == 2:
        # one shared candidate set for every location (e.g. knot grids)
        gram = jnp.matmul(
            locations, points.T, precision=jax.lax.Precision.HIGHEST
        )
    else:
        gram = jnp.einsum(
            "bf,bnf->bn",
            locations,
            points,
            precision=jax.lax.Precision.HIGHEST,
        )
    d2 = (
        jnp.sum(locations * locations, axis=-1)[..., None]
        + jnp.sum(points * points, axis=-1)
        - 2.0 * gram
    )
    return jnp.maximum(d2, 0.0)


def fast_nn_update(train_nn_indices: jnp.ndarray) -> jnp.ndarray:
    """Make neighborhoods self-inclusive: ``[i, nn_0, ..., nn_{k-2}]``."""
    train_count = train_nn_indices.shape[0]
    self_col = jnp.arange(train_count, dtype=train_nn_indices.dtype)[:, None]
    return jnp.concatenate((self_col, train_nn_indices[:, :-1]), axis=1)


def make_fast_predict_tensors(
    batch_nn_indices: jnp.ndarray,
    train_features: jnp.ndarray,
    train_targets: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise diffs + targets over self-inclusive neighborhoods."""
    nn_fast = fast_nn_update(batch_nn_indices)
    return pairwise_diffs(train_features, nn_fast), train_targets[nn_fast]


def batch_features_tensor(
    features: jnp.ndarray, batch_indices: jnp.ndarray
) -> jnp.ndarray:
    return _atleast_feature_dim(features)[batch_indices]


def make_heteroscedastic_tensor(
    measurement_noise: jnp.ndarray, batch_nn_indices: jnp.ndarray
) -> jnp.ndarray:
    return measurement_noise[batch_nn_indices]
