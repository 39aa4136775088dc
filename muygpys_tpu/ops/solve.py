"""Batched per-neighborhood posterior solvers (the hot path).

TPU-first redesign of the reference's mean/variance backends
(``_src/gp/muygps/{numpy,jax}.py``):

- **Cholesky everywhere.** ``Kin + nugget`` is SPD, so we factor once with
  batched Cholesky (half the FLOPs of the reference's LU ``linalg.solve``) and
  reuse the factor across mean, variance, and analytic-scale — the reference
  re-solves three times per objective evaluation (SURVEY.md §3.2).
- **Static-shape generic flattening.** The reference's numpy backend computes
  shapes dynamically (``_src/gp/muygps/numpy.py:17-67``) and its jax backend
  branches per-ndim because "batch_in_ndim is variable" under jit
  (``jax.py:20-21``).  Under ``jax.jit`` every shape is static at trace time,
  so the generic numpy-style logic works for *all* layouts in one code path.
- Everything here is a pure function; ``jax.grad`` flows through the Cholesky.

Shape conventions (matching the reference):
- univariate: ``Kin (b, n, n)``, ``Kcross (b, n)``, ``nn_targets (b, n, r)``
- flattened multivariate (e.g. shear): ``Kin (b, i, n, i, n)``,
  ``Kcross (b, i, n, j)``, ``nn_targets (b, i, n)``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_solve, solve_triangular


def _prod(shape) -> int:
    return int(math.prod(shape)) if len(shape) else 1


def _find_matching_ndim(nn_targets: jnp.ndarray, Kin: jnp.ndarray) -> int:
    """Count of leading dims shared by nn_targets and Kin (static shapes)."""
    count = 0
    for a, b in zip(nn_targets.shape, Kin.shape):
        if a != b:
            break
        count += 1
    return count


def _mean_shapes(Kin, Kcross, nn_targets):
    batch_in_ndim = _find_matching_ndim(nn_targets, Kin)
    in_shape = Kin.shape[batch_in_ndim:]
    out_shape = Kcross.shape[batch_in_ndim:]
    batch_shape = Kin.shape[: -2 * len(in_shape)]
    extra_shape = nn_targets.shape[len(batch_shape) + len(in_shape) :]
    return batch_shape, in_shape, out_shape, extra_shape


def _var_shapes(Kin, Kcross, batch_dim_count: int):
    in_dim_count = (Kin.ndim - batch_dim_count) // 2
    batch_shape = Kin.shape[:batch_dim_count]
    in_shape = Kin.shape[batch_dim_count + in_dim_count :]
    out_shape = Kcross.shape[batch_dim_count + in_dim_count :]
    return batch_shape, in_shape, out_shape


def _chol(Kin_flat: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky factor."""
    return lax.linalg.cholesky(Kin_flat)


def posterior_mean(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    nn_targets: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """``mu = Kcross (Kin)^{-1} Y`` per neighborhood (generic layout).

    Parity: ``_muygps_posterior_mean`` (``_src/gp/muygps/numpy.py:17-41``).
    """
    batch_shape, in_shape, out_shape, extra_shape = _mean_shapes(
        Kin, Kcross, nn_targets
    )
    in_size = _prod(in_shape)
    out_size = _prod(out_shape)
    extra_size = _prod(extra_shape)

    Kin_flat = Kin.reshape(batch_shape + (in_size, in_size))
    Kcross_flat = Kcross.reshape(batch_shape + (in_size, out_size))
    targets_flat = nn_targets.reshape(batch_shape + (in_size, extra_size))

    L = _chol(Kin_flat)
    F = cho_solve((L, True), Kcross_flat)
    ret = jnp.swapaxes(F, -2, -1) @ targets_flat
    return ret.reshape(batch_shape + out_shape + extra_shape)


def diagonal_variance(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    batch_dim_count: int = 1,
    **kwargs,
) -> jnp.ndarray:
    """``Kout - Kcross (Kin)^{-1} Kcross^T`` per neighborhood.

    Parity: ``_muygps_diagonal_variance`` (``_src/gp/muygps/numpy.py:44-67``).
    """
    batch_shape, in_shape, out_shape = _var_shapes(Kin, Kcross, batch_dim_count)
    in_size = _prod(in_shape)
    out_size = _prod(out_shape)

    Kin_flat = Kin.reshape(batch_shape + (in_size, in_size))
    Kcross_flat = Kcross.reshape(batch_shape + (in_size, out_size))

    L = _chol(Kin_flat)
    # V = L^{-1} Kcross  =>  Kcross^T Kin^{-1} Kcross = V^T V (symmetric PSD)
    V = solve_triangular(L, Kcross_flat, lower=True)
    Kpost = jnp.swapaxes(V, -2, -1) @ V
    return Kout - Kpost.reshape(batch_shape + out_shape + out_shape)


def posterior_mean_and_variance(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused mean + variance sharing one Cholesky factorization."""
    batch_shape, in_shape, out_shape, extra_shape = _mean_shapes(
        Kin, Kcross, nn_targets
    )
    in_size = _prod(in_shape)
    out_size = _prod(out_shape)
    extra_size = _prod(extra_shape)

    Kin_flat = Kin.reshape(batch_shape + (in_size, in_size))
    Kcross_flat = Kcross.reshape(batch_shape + (in_size, out_size))
    targets_flat = nn_targets.reshape(batch_shape + (in_size, extra_size))

    L = _chol(Kin_flat)
    V = solve_triangular(L, Kcross_flat, lower=True)  # (b, in, out)
    W = solve_triangular(L, targets_flat, lower=True)  # (b, in, extra)
    mean = jnp.swapaxes(V, -2, -1) @ W
    Kpost = jnp.swapaxes(V, -2, -1) @ V
    mean = mean.reshape(batch_shape + out_shape + extra_shape)
    var = Kout - Kpost.reshape(batch_shape + out_shape + out_shape)
    return mean, var


def posterior_mean_variance_scale(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
    batch_count_global: Optional[float] = None,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused mean + unscaled variance + analytic sigma^2, ONE Cholesky.

    This is the whole inner loop of a LOO objective evaluation; the reference
    performs three independent ``linalg.solve`` factorizations for the same
    quantities (SURVEY.md §3.2).  The scale numerator uses
    ``y^T Kin^{-1} y = |L^{-1} y|^2``.

    ``batch_count_global``: when the batch dim is sharded across devices, pass
    the *global* batch count so the normalization matches the reference's
    allreduced semantics (``_src/optimize/scale/mpi.py:20-38``); the sum in the
    numerator then rides a psum inserted by XLA.
    """
    batch_shape, in_shape, out_shape, extra_shape = _mean_shapes(
        Kin, Kcross, nn_targets
    )
    in_size = _prod(in_shape)
    out_size = _prod(out_shape)
    extra_size = _prod(extra_shape)

    Kin_flat = Kin.reshape(batch_shape + (in_size, in_size))
    Kcross_flat = Kcross.reshape(batch_shape + (in_size, out_size))
    targets_flat = nn_targets.reshape(batch_shape + (in_size, extra_size))

    L = _chol(Kin_flat)
    V = solve_triangular(L, Kcross_flat, lower=True)
    W = solve_triangular(L, targets_flat, lower=True)

    mean = (jnp.swapaxes(V, -2, -1) @ W).reshape(
        batch_shape + out_shape + extra_shape
    )
    var = Kout - (jnp.swapaxes(V, -2, -1) @ V).reshape(
        batch_shape + out_shape + out_shape
    )
    if batch_count_global is None:
        batch_count_global = _prod(batch_shape)
    scale = jnp.sum(W * W) / (batch_count_global * in_size)
    return mean, var, scale


def fast_posterior_mean(
    Kcross: jnp.ndarray, coeffs: jnp.ndarray, **kwargs
) -> jnp.ndarray:
    """Serve-time fast mean: ``Kcross . C`` (no solve).

    Parity: ``_muygps_fast_posterior_mean`` (``_src/gp/muygps/numpy.py:70-77``).
    """
    if coeffs.ndim == 2:
        coeffs = coeffs[:, :, None]
    out = jnp.einsum("ij,ijk->ik", Kcross, coeffs)
    return jnp.squeeze(out)


def mmuygps_fast_posterior_mean(
    Kcross: jnp.ndarray, coeffs: jnp.ndarray, **kwargs
) -> jnp.ndarray:
    """Multivariate fast mean with per-response Kcross: (b,n,r),(b,n,r)->(b,r)."""
    return jnp.einsum("ijk,ijk->ik", Kcross, coeffs)


def fast_posterior_mean_precompute(
    Kin: jnp.ndarray, train_nn_targets_fast: jnp.ndarray, **kwargs
) -> jnp.ndarray:
    """Offline coefficients ``C = (Kin)^{-1} Y`` over self-inclusive nbrhds.

    Parity: ``_muygps_fast_posterior_mean_precompute``
    (``_src/gp/muygps/numpy.py:88-95``).
    """
    y = train_nn_targets_fast
    if y.ndim == 2:
        y = y[:, :, None]
    L = _chol(Kin)
    return jnp.squeeze(cho_solve((L, True), y))


def serve_mean_and_variance(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Serve-optimized fused mean + variance: ONE batched solve.

    Stacks ``[Kcross, Y]`` as right-hand sides of a single ``Kin`` solve —
    ``mean = Kcross . (Kin^{-1} Y)`` and ``var = Kout - Kcross . (Kin^{-1}
    Kcross)`` both read off the same solution.  Measured ~1.6x faster than
    the two-triangular-solve Cholesky path on TPU v5e for (8192, 30, 30)
    batches (XLA's batched LU beats its batched Cholesky at this size).

    Univariate/diagonal-multivariate layouts: ``Kin (b, n, n)``,
    ``Kcross (b, n)``, ``nn_targets (b, n[, r])``; returns mean ``(b[, r])``
    and variance ``(b,)``.
    """
    squeeze_r = nn_targets.ndim == 2
    y = nn_targets[:, :, None] if squeeze_r else nn_targets
    rhs = jnp.concatenate([Kcross[:, :, None], y], axis=-1)
    sol = jnp.linalg.solve(Kin, rhs)
    mean = jnp.einsum("bn,bnr->br", Kcross, sol[:, :, 1:])
    var = Kout - jnp.einsum("bn,bn->b", Kcross, sol[:, :, 0])
    if squeeze_r:
        mean = mean[:, 0]
    return mean, var
