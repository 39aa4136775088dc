"""Pallas TPU kernel: fused MuyGPs posterior predict.

One kernel pass per batch tile computes, entirely in VMEM:
distance scaling -> Matern kernel -> nugget -> unrolled Cholesky ->
forward/backward triangular solves -> posterior mean and variance.

Layout follows :mod:`muygpys_tpu.ops.lanes_solver`: batch on the lane axis
(``pw (n, n, B)``), so every Cholesky step is a full-width vector op over a
``TB``-lane tile.  HBM traffic is one read of (pw, cw, y) and one write of
(mean, var) — the XLA batch-last version re-materializes the kernel matrix
and factor between fused regions.  Measured 0.17 ms per (8192, 30) f32 batch
on v5e (48.5M preds/sec/chip; PERF.md).

Contractions are written as explicit multiply+sum over leading axes (Mosaic
does not lower arbitrary dot_general layouts with the batch on the lane
axis).  Supports Matern smoothness in {1/2, 3/2, 5/2, inf} (static) and
multivariate targets ``y (n, r, B)``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


def _matern(d, smoothness):
    if smoothness == 0.5:
        return jnp.exp(-d)
    if smoothness == 1.5:
        t = d * _SQRT3
        return (1.0 + t) * jnp.exp(-t)
    if smoothness == 2.5:
        t = d * _SQRT5
        return (1.0 + t + t * t / 3.0) * jnp.exp(-t)
    if smoothness == math.inf:
        return jnp.exp(-(d * d) / 2.0)
    raise ValueError(
        f"pallas kernel supports smoothness 0.5/1.5/2.5/inf, got {smoothness}"
    )


def _kernel_body(
    inv_ls, noise, smoothness, pw_ref, cw_ref, y_ref, mean_ref, var_ref
):
    n = pw_ref.shape[0]
    r = y_ref.shape[1]
    pw = pw_ref[:]  # (n, n, TB)
    cw = cw_ref[:]  # (n, TB)
    y = y_ref[:]  # (n, r, TB)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(pw.dtype)[:, :, None]

    K = _matern(pw * inv_ls, smoothness) + noise * eye  # (n, n, TB)
    kc = _matern(cw * inv_ls, smoothness)  # (n, TB)

    # unrolled right-looking Cholesky, batch on lanes
    cols = []
    for j in range(n):
        c = K[:, j, :]  # (n, TB)
        if j > 0:
            Lpre = jnp.stack(cols, axis=1)  # (n, j, TB)
            Lj = Lpre[j]  # (j, TB)
            c = c - jnp.sum(Lpre * Lj[None, :, :], axis=1)
        d = jnp.sqrt(c[j])
        colv = c / d
        keep = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j)
        cols.append(jnp.where(keep, colv, 0.0))
    L = jnp.stack(cols, axis=1)  # (n, n, TB)

    # forward substitution for RHS [kc | y]
    zc, zy = [], []
    for j in range(n):
        ac = kc[j]  # (TB,)
        ay = y[j]  # (r, TB)
        if j > 0:
            Lrow = L[j, :j, :]  # (j, TB)
            ac = ac - jnp.sum(Lrow * jnp.stack(zc), axis=0)
            ay = ay - jnp.sum(
                Lrow[:, None, :] * jnp.stack(zy), axis=0
            )
        zc.append(ac / L[j, j])
        zy.append(ay / L[j, j][None, :])
    Zc = jnp.stack(zc)  # (n, TB)
    Zy = jnp.stack(zy)  # (n, r, TB)

    mean_ref[:] = jnp.sum(Zc[:, None, :] * Zy, axis=0)  # (r, TB)
    var_ref[0, :] = 1.0 - jnp.sum(Zc * Zc, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "length_scale", "noise", "smoothness", "batch_tile", "interpret"
    ),
)
def fused_predict_bl(
    pw: jnp.ndarray,
    cw: jnp.ndarray,
    y: jnp.ndarray,
    length_scale: float,
    noise: float,
    smoothness: float = 1.5,
    batch_tile: int = 256,
    interpret: bool = False,
):
    """Posterior (mean, var) from batch-last distance tensors via one Pallas
    kernel.  ``pw (n, n, B)``, ``cw (n, B)``, ``y (n, B)`` or ``(n, r, B)``;
    B must divide by ``batch_tile``.  Unit prior variance (Kout = 1).

    Returns mean ``(r, B)`` and variance ``(B,)``.
    """
    n, _, B = pw.shape
    if y.ndim == 2:
        y = y[:, None, :]
    r = y.shape[1]
    if B % batch_tile != 0:
        raise ValueError(f"batch {B} must divide batch_tile {batch_tile}")
    grid = (B // batch_tile,)
    # serving constants are baked into the kernel (static under jit)
    inv_ls = float(1.0 / length_scale)
    noise = float(noise)

    kernel = functools.partial(_kernel_body, inv_ls, noise, smoothness)
    mean, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n, n, batch_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, r, batch_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (r, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, B), pw.dtype),
            jax.ShapeDtypeStruct((1, B), pw.dtype),
        ),
        interpret=interpret,
    )(pw, cw, y)
    return mean, var[0]
