"""Loss functions for leave-one-out cross-validation objectives.

Parity surface of ``_src/optimize/loss/{numpy,jax}.py``: cross-entropy
(numpy.py:12-19), mse (:22-31), lool (:34-60), unscaled lool, pseudo-Huber
(:64-71), looph (:74-115).  All pure JAX, jit/grad-safe, and written as
sums-of-local-terms so that under a sharded batch axis the reduction lowers to
a single psum (replacing the reference MPI backend's ``allreduce(SUM)``,
``_src/optimize/loss/mpi.py:21-103``).

Every loss accepts optional ``row_weights (batch,)`` multiplying each batch
row's contribution (normalized losses divide by the weight total).  With
0/1 weights this makes padded rows semantically absent — the mechanism
behind ragged-batch sharding (``parallel.sharding.shard_ragged``; the
reference instead gives early MPI ranks one extra row,
``_src/mpi_utils.py:36-41``).  Non-binary weights give importance
weighting for free.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def _weights_like(predictions: jnp.ndarray, row_weights):
    """Broadcastable per-row weights (or None)."""
    if row_weights is None:
        return None
    w = jnp.asarray(row_weights, predictions.dtype)
    return w.reshape(w.shape[0], *([1] * (predictions.ndim - 1)))


def cross_entropy_fn(
    predictions: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-15,
    row_weights=None, **kwargs,
) -> jnp.ndarray:
    """Unnormalized log loss of softmaxed predictions vs one-hot targets.

    Matches sklearn ``log_loss(..., normalize=False)`` on softmax outputs as
    used by the reference (``_src/optimize/loss/numpy.py:12-19``), with
    predictions clipped to ``[eps, 1-eps]`` and renormalized, exactly as
    sklearn does.
    """
    one_hot = jnp.where(targets > 0.0, 1.0, 0.0)
    probs = jnn.softmax(predictions, axis=1)
    probs = jnp.clip(probs, eps, 1.0 - eps)
    probs = probs / jnp.sum(probs, axis=1, keepdims=True)
    terms = one_hot * jnp.log(probs)
    w = _weights_like(terms, row_weights)
    if w is not None:
        terms = terms * w
    return -jnp.sum(terms)


def mse_fn_unnormalized(
    predictions: jnp.ndarray, targets: jnp.ndarray, row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    terms = (predictions - targets) ** 2
    w = _weights_like(terms, row_weights)
    if w is not None:
        terms = terms * w
    return jnp.sum(terms)


def mse_fn(
    predictions: jnp.ndarray, targets: jnp.ndarray, row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    num = mse_fn_unnormalized(
        predictions, targets, row_weights=row_weights
    )
    if row_weights is None:
        return num / predictions.size
    per_row = predictions.size // predictions.shape[0]
    return num / (
        jnp.sum(jnp.asarray(row_weights, predictions.dtype)) * per_row
    )


def _floor_variances(variances: jnp.ndarray) -> jnp.ndarray:
    """Floor at a dtype-scaled epsilon: at f32, near-singular neighborhoods
    round the posterior variance slightly negative, and log() of it NaNs the
    whole objective — L-BFGS then silently keeps the initial parameters."""
    eps = 10.0 * jnp.finfo(variances.dtype).eps
    return jnp.maximum(variances, eps)


def lool_fn_unscaled(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    variances: jnp.ndarray,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    """Leave-one-out likelihood (Eq. 10 of arXiv:2209.11280)."""
    if variances.ndim == 1 or variances.ndim == predictions.ndim:
        variances = _floor_variances(variances)
        if variances.ndim == 1 and predictions.ndim == 2:
            # guard against (b, r) / (b,) silently broadcasting to (b, b)
            variances = variances[:, None]
        terms = (predictions - targets) ** 2 / variances + jnp.log(
            variances
        )
        w = _weights_like(terms, row_weights)
        if w is not None:
            terms = terms * w
        return jnp.sum(terms)
    # full multivariate covariance blocks: (b, r, r)
    residual = predictions - targets
    if residual.ndim == 1:
        residual = residual[:, None]
    sol = jnp.linalg.solve(variances, residual[..., None])
    quad = jnp.squeeze(residual[..., None, :] @ sol, axis=(-2, -1))
    _, logdet = jnp.linalg.slogdet(variances)
    terms = quad + logdet
    if row_weights is not None:
        terms = terms * jnp.asarray(row_weights, terms.dtype)
    return jnp.sum(terms)


def lool_fn(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    variances: jnp.ndarray,
    scale,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    return lool_fn_unscaled(
        predictions, targets, scale * variances, row_weights=row_weights
    )


def pseudo_huber_fn(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    boundary_scale: float = 1.5,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    bs2 = boundary_scale**2
    terms = (
        jnp.sqrt(1.0 + ((targets - predictions) / boundary_scale) ** 2)
        - 1.0
    )
    w = _weights_like(terms, row_weights)
    if w is not None:
        terms = terms * w
    return bs2 * jnp.sum(terms)


def looph_fn_unscaled(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    variances: jnp.ndarray,
    boundary_scale: float = 3.0,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    """Leave-one-out pseudo-Huber (Eq. 8 of arXiv:2409.11577)."""
    if variances.ndim == 1 and predictions.ndim == 2:
        variances = variances[:, None]
    variances = _floor_variances(variances)
    bs2 = boundary_scale**2
    terms = (
        2.0
        * bs2
        * (
            jnp.sqrt(1.0 + (targets - predictions) ** 2 / (bs2 * variances))
            - 1.0
        )
        + jnp.log(variances)
    )
    w = _weights_like(terms, row_weights)
    if w is not None:
        terms = terms * w
    return jnp.sum(terms)


def looph_fn(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    variances: jnp.ndarray,
    scale,
    boundary_scale: float = 3.0,
    row_weights=None,
    **kwargs,
) -> jnp.ndarray:
    return looph_fn_unscaled(
        predictions,
        targets,
        scale * variances,
        boundary_scale=boundary_scale,
        row_weights=row_weights,
    )
