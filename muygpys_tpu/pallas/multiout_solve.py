"""Pallas TPU kernel: fused multi-output (block) posterior solve.

The lensing shear family (reference ``gp/kernels/experimental/shear.py:
60-265``) conditions on a FLATTENED observation block per query — ``m =
I * nn`` rows (e.g. 3 x 30 = 90 for the 3-in/3-out kernel) — and emits a
posterior mean ``(o,)`` plus a full ``(o, o)`` covariance.  The XLA
batch-on-lanes block solver (:func:`muygpys_tpu.ops.lanes_solver.
serve_mean_and_variance_multiout_bl`) expresses the unrolled Cholesky as
~m separate full-width vector ops per step, each reading/writing the
``(m, ., B)`` operands through HBM-resident intermediates XLA only
partially fuses.  This kernel runs the whole augmented elimination in ONE
VMEM pass per batch tile — the multi-output analogue of
:func:`muygpys_tpu.pallas.fused_predict._solve_and_emit`:

    work = [Kin | Kcross (o cols) | y]   (m, m+o+1, TB) VMEM scratch
    eliminate m pivots in place          (rsqrt + one fused mul-sub each)
    zc = work[:, m:m+o]; zy = work[:, m+o]
    mean = zc^T zy                       (o, TB)
    S    = zc^T zc                       (o, o, TB); cov = Kout - S

HBM traffic is one read of (Kin, Kcross, y) and one write of (mean, S) —
the analytic minimum for a pre-assembled-blocks path.  The (3, 3)-block
shear COVARIANCE ASSEMBLY stays in XLA (elementwise polynomial evaluation
over difference tensors — XLA fuses it into a handful of kernels; the
measured decomposition lives in ``scripts/measure_shear_serve.py``).

VMEM sizing: the dominant residents are the ``(m, m, TB)`` input block
and the ``(m, m+o+1, TB)`` scratch — ``~8 m^2 TB`` bytes f32.  The
wrapper caps the tile so this stays inside the 16M scoped budget
(TB=128 at m=90 measured 8.7M).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _multiout_body(o, kin_ref, kc_ref, y_ref, mean_ref, s_ref, work):
    m = kin_ref.shape[0]
    work[:, :m, :] = kin_ref[:]
    work[:, m:m + o, :] = kc_ref[:]
    work[:, m + o, :] = y_ref[:]
    # Gill-Murray pivot floor, SAME contract as ops/lanes_solver.
    # cholesky_bl: a numerically singular block (duplicate neighbors at
    # f32) otherwise yields rsqrt(<=0) = inf/NaN and poisons the whole
    # batch tile.  Relative floor (10 eps x mean diagonal per lane); where
    # it activates, the sub-diagonal column is zeroed so the tiny pivot
    # does not propagate into the trailing updates.
    diag_scale = sum(work[j, j, :] for j in range(m)) / m  # (TB,)
    floor = 10.0 * jnp.finfo(work.dtype).eps * jnp.maximum(
        diag_scale, jnp.finfo(work.dtype).tiny
    )
    for j in range(m):
        piv = work[j, j, :]  # (TB,)
        bad = (piv < floor)[None, :]
        d = jnp.sqrt(jnp.maximum(piv, floor))
        inv = 1.0 / d
        rowj = work[j, j:, :] * inv[None, :]  # (m+o+1-j, TB)
        work[j, j:, :] = rowj
        if j < m - 1:
            lcol = jnp.where(
                bad, 0.0, work[j + 1:, j, :] * inv[None, :]
            )
            work[j + 1:, j:, :] = (
                work[j + 1:, j:, :] - lcol[:, None, :] * rowj[None, :, :]
            )
    zc = work[:, m:m + o, :]  # (m, o, TB) = L^{-1} Kcross
    zy = work[:, m + o, :]  # (m, TB)    = L^{-1} y
    mean_ref[:] = jnp.sum(zc * zy[:, None, :], axis=0)  # (o, TB)
    s_ref[:] = jnp.sum(
        zc[:, :, None, :] * zc[:, None, :, :], axis=0
    )  # (o, o, TB)


def multiout_tile_cap(m: int, max_tile: int = 512) -> int:
    """Largest power-of-two batch tile keeping ``~8 m^2 TB`` bytes of
    block + scratch inside the 16M VMEM scoped budget (12M usable after
    the small operands)."""
    cap = max(1, (12 * 1024 * 1024) // (8 * m * m))
    tile = 1
    while tile * 2 <= min(cap, max_tile):
        tile *= 2
    return tile


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret")
)
def fused_multiout_solve_bl(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    y: jnp.ndarray,
    batch_tile: int = 0,
    interpret: bool = False,
):
    """Posterior (mean, cov) for multi-output blocks in ONE kernel pass.

    ``Kin (m, m, B)`` SPD observation blocks (nugget already applied),
    ``Kcross (m, o, B)``, ``Kout (o, o)`` prior output covariance,
    ``y (m, B)`` flattened observations.  ``batch_tile=0`` picks the
    largest VMEM-safe power of two dividing ``B``.

    Returns mean ``(o, B)`` and posterior covariance ``(o, o, B)`` —
    the same contract as :func:`muygpys_tpu.ops.lanes_solver.
    serve_mean_and_variance_multiout_bl`.
    """
    m, _, B = Kin.shape
    o = Kcross.shape[1]
    tile = batch_tile if batch_tile else multiout_tile_cap(m)
    tile = min(tile, B)
    while B % tile:
        tile //= 2
    grid = (B // tile,)
    kernel = functools.partial(_multiout_body, o)
    mean, S = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m, m, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, o, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (o, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (o, o, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((o, B), Kin.dtype),
            jax.ShapeDtypeStruct((o, o, B), Kin.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, m + o + 1, tile), Kin.dtype),
        ],
        interpret=interpret,
    )(Kin, Kcross, y)
    cov = jnp.asarray(Kout, Kin.dtype)[:, :, None] - S
    return mean, cov


def multiout_serve_pallas(
    Kin: jnp.ndarray,
    Kcross: jnp.ndarray,
    Kout: jnp.ndarray,
    nn_targets: jnp.ndarray,
    interpret: bool = False,
):
    """Frontend-layout multi-output serve via the fused kernel.

    Same contract as :func:`muygpys_tpu.ops.lanes_solver.
    multiout_serve_mean_and_variance`: ``Kin (B, I, n, I, n)`` (nugget
    applied), ``Kcross (B, I, n, O)``, ``nn_targets (B, I, n)``,
    ``Kout (O, O)``; returns mean ``(B, O)``, cov ``(B, O, O)``.
    """
    from muygpys_tpu.ops.lanes_solver import multiout_frontend_bl

    Kin_bl, Kc_bl, y_bl = multiout_frontend_bl(Kin, Kcross, nn_targets)
    mean, cov = fused_multiout_solve_bl(
        Kin_bl, Kc_bl, Kout, y_bl, interpret=interpret
    )
    return jnp.transpose(mean, (1, 0)), jnp.transpose(cov, (2, 0, 1))
