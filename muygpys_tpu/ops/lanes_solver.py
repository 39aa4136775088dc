"""Layout-optimized batched Cholesky solver: batch on the LANE axis.

XLA's batched Cholesky/LU custom calls process ``(B, n, n)`` tensors one
small matrix per MXU/VPU invocation; for n ~ 30 the (n, n) trailing tile
wastes ~4/5 of every (8, 128) register tile and the custom call dominates the
serve path (measured 43–85 ms per (8192, 30, 30) batch on v5e).

This module stores the batch on the LAST axis — ``K (n, n, B)`` — so every
step of an unrolled right-looking Cholesky and the triangular substitutions
is a full-width ``(., B)`` vector op.  Measured 8 ms for the same workload:
~5x over XLA Cholesky, ~10x over LU.  This is the fused-batched-solver design
the TPU wants, expressed in pure XLA (a Pallas port would fuse the kernel
evaluation into the same pass; see PERF.md).

Unrolled Python loops mean the jaxpr grows with n — intended for the serve
path where n = nn_count <= ~64 and the program is compiled once.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def cholesky_bl(K: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of SPD ``K`` with shape ``(n, n, B)``.

    Modified-Cholesky step for numerically singular neighborhoods: at f32 a
    non-positive pivot otherwise yields sqrt(negative) and a NaN that
    poisons the whole batch — under LOO optimization that NaN-cliffs the
    objective and silently aborts the line search.  Flooring the pivot alone
    is NOT enough: dividing the column by the tiny floored sqrt amplifies
    the sub-diagonal entries ~1/sqrt(floor)x and the trailing updates
    overflow f32 to inf.  So where the floor activates, the sub-diagonal
    column is also zeroed (Gill–Murray-style: row/col j of K is replaced by
    a diagonal spike, leaving the trailing submatrix untouched).  The factor
    is a nearby PSD surrogate: the objective stays finite (and large, since
    the tiny pivot inflates the solves), gradients stay finite, and the
    optimizer retreats smoothly.

    The floor is *relative* — ``10 eps * mean(diag K)`` per lane — so it
    behaves identically for kernels scaled far from unit prior variance
    (an absolute ``10 eps`` floor would floor every pivot of a uniformly
    tiny-scale K, or miss degeneracy in a large-scale one).
    """
    n = K.shape[0]
    diag_scale = sum(K[j, j, :] for j in range(n)) / n  # (B,)
    pivot_floor = 10.0 * jnp.finfo(K.dtype).eps * jnp.maximum(
        diag_scale, jnp.finfo(K.dtype).tiny
    )
    cols = []
    for j in range(n):
        c = K[:, j, :]  # (n, B)
        if j > 0:
            Lj = jnp.stack([cols[k][j] for k in range(j)])  # (j, B)
            Lpre = jnp.stack(cols, axis=1)  # (n, j, B)
            c = c - jnp.einsum("ikb,kb->ib", Lpre, Lj)
        bad = (c[j] < pivot_floor)[None, :]  # (1, B) lanes needing surrogate
        d = jnp.sqrt(jnp.maximum(c[j], pivot_floor))
        col = jnp.where(bad, 0.0, c / d)
        col = col.at[j].set(d)
        mask = (jnp.arange(n) >= j)[:, None]
        cols.append(jnp.where(mask, col, 0.0))
    return jnp.stack(cols, axis=1)  # (n, n, B)


def tri_solve_fwd_bl(L: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L z = R`` with lower ``L (n, n, B)`` and ``R (n, r, B)``."""
    n = L.shape[0]
    zs = []
    for j in range(n):
        acc = R[j]  # (r, B)
        if j > 0:
            Lrow = jnp.stack([L[j, k] for k in range(j)])  # (j, B)
            Z = jnp.stack(zs)  # (j, r, B)
            acc = acc - jnp.einsum("kb,krb->rb", Lrow, Z)
        zs.append(acc / L[j, j])
    return jnp.stack(zs)  # (n, r, B)


def tri_solve_bwd_bl(L: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L^T x = Z`` with lower ``L (n, n, B)`` and ``Z (n, r, B)``."""
    n = L.shape[0]
    xs = [None] * n
    for j in reversed(range(n)):
        acc = Z[j]
        ks = list(range(j + 1, n))
        if ks:
            Lcol = jnp.stack([L[k, j] for k in ks])  # (m, B)
            X = jnp.stack([xs[k] for k in ks])  # (m, r, B)
            acc = acc - jnp.einsum("kb,krb->rb", Lcol, X)
        xs[j] = acc / L[j, j]
    return jnp.stack(xs)


def solve_bl(K: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """``K^{-1} R`` for SPD ``K (n, n, B)`` and ``R (n, r, B)``."""
    L = cholesky_bl(K)
    return tri_solve_bwd_bl(L, tri_solve_fwd_bl(L, R))


def serve_mean_and_variance_bl(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout,
    nn_targets: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused posterior mean + variance in batch-last layout.

    Args: ``Kin (n, n, B)``, ``Kcross (n, B)``, ``nn_targets (n, r, B)``.
    Returns mean ``(r, B)`` and variance ``(B,)``.
    """
    rhs = jnp.concatenate([Kcross[:, None, :], nn_targets], axis=1)
    sol = solve_bl(Kin, rhs)  # (n, 1+r, B)
    mean = jnp.einsum("nb,nrb->rb", Kcross, sol[:, 1:, :])
    var = Kout - jnp.einsum("nb,nb->b", Kcross, sol[:, 0, :])
    return mean, var


def serve_mean_and_variance_multiout_bl(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-output posterior (full covariance block) in batch-last layout.

    The multi-output analogue of :func:`serve_mean_and_variance_bl` for
    kernels whose cross-covariance carries an output dimension (the lensing
    shear family, SURVEY §2.4): ``Kin (m, m, B)`` with ``m`` the flattened
    observation size (e.g. 3*nn for the 3-in/3-out shear kernel),
    ``Kcross (m, o, B)``, ``Kout (o, o)``, ``nn_targets (m, B)``.

    One forward substitution against the stacked ``[Kcross | y]`` right-hand
    side serves both moments: with ``z = L^{-1}[Kcross | y]``,
    ``mean = zc^T zy`` and ``cov = Kout - zc^T zc`` — no back substitution.

    Returns mean ``(o, B)`` and posterior covariance ``(o, o, B)``.
    """
    o = Kcross.shape[1]
    rhs = jnp.concatenate([Kcross, nn_targets[:, None, :]], axis=1)
    L = cholesky_bl(Kin)
    z = tri_solve_fwd_bl(L, rhs)  # (m, o+1, B)
    zc = z[:, :o, :]
    zy = z[:, o, :]
    mean = jnp.einsum("mob,mb->ob", zc, zy)
    cov = Kout[:, :, None] - jnp.einsum("mob,mpb->opb", zc, zc)
    return mean, cov


def multiout_frontend_bl(
    Kin: jnp.ndarray, Kcross: jnp.ndarray, nn_targets: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frontend block layout -> batch-last operands: ``Kin (B, I, n, I,
    n)`` / ``Kcross (B, I, n, O)`` / ``nn_targets (B, I, n)`` become
    ``(m, m, B)`` / ``(m, O, B)`` / ``(m, B)`` with ``m = I * n``.
    Shared by the XLA and Pallas multi-output engines so their layout
    contracts can never diverge."""
    B, I, n = Kin.shape[0], Kin.shape[1], Kin.shape[2]
    m = I * n
    o = Kcross.shape[-1]
    return (
        jnp.transpose(Kin.reshape(B, m, m), (1, 2, 0)),
        jnp.transpose(Kcross.reshape(B, m, o), (1, 2, 0)),
        jnp.transpose(nn_targets.reshape(B, m), (1, 0)),
    )


def multiout_serve_mean_and_variance(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frontend-layout multi-output serve via the batch-last solver.

    Accepts the block-tensor layout the shear kernels produce
    (reference ``_src/gp/kernels/shear/numpy.py`` block assembly):
    ``Kin (B, I, n, I, n)``, ``Kcross (B, I, n, O)``,
    ``nn_targets (B, I, n)``, ``Kout (O, O)``.  Returns mean ``(B, O)``
    and posterior covariance ``(B, O, O)`` — same contract as the generic
    :func:`muygpys_tpu.ops.solve.posterior_mean_and_variance`, but with
    the flattened ``I*n`` observation block on the sublane axis and the
    batch on the lane axis (the layout discovery in this module's header).
    """
    Kin_bl, Kc_bl, y_bl = multiout_frontend_bl(Kin, Kcross, nn_targets)
    mean, cov = serve_mean_and_variance_multiout_bl(
        Kin_bl, Kc_bl, Kout, y_bl
    )
    return jnp.transpose(mean, (1, 0)), jnp.transpose(cov, (2, 0, 1))
