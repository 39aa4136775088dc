"""Pallas TPU kernels: fused MuyGPs posterior predict.

One kernel pass per batch tile computes, entirely in VMEM:
(distance assembly ->) kernel eval -> nugget -> unrolled Cholesky ->
forward/backward triangular solves -> posterior mean and variance.

Layout follows :mod:`muygpys_tpu.ops.lanes_solver`: batch on the lane axis
(``pw (n, n, B)``), so every Cholesky step is a full-width vector op over a
``TB``-lane tile.

Two entry points:

- :func:`fused_predict_bl` — consumes pre-assembled *distance* tensors
  (``pw (n, n, B)``).  HBM traffic is one read of (pw, cw, y) and one write
  of (mean, var).
- :func:`fused_predict_coords_bl` — consumes neighbor *coordinates*
  (``nf (n, d, B)``) and queries (``q (d, B)``) and computes the crosswise/
  pairwise distances in VMEM.  For the d << n feature counts MuyGPs runs at
  (sky coords d=2, tutorials d=1) this cuts HBM bytes/prediction ~n/d x on a
  bandwidth-bound kernel — the round-1 distance kernel measured ~21% of the
  v5e HBM roofline; streaming coordinates raises the analytic ceiling ~15x
  at (n=30, d=2).  Per-feature length scales fold anisotropy
  (reference ``gp/deformation/anisotropy.py``) into the same kernel, and an
  optional per-neighbor nugget tensor folds heteroscedastic noise
  (reference ``_src/gp/noise/numpy.py:56-67``).

Hyperparameters (length_scale(s), noise) are **traced SMEM scalars**, so ONE
cached Mosaic executable serves every trained model of a given shape —
round 1 baked them in as compile-time constants, costing a ~10-minute cold
recompile per newly trained model.

Contractions are written as explicit multiply+sum over leading axes (Mosaic
does not lower arbitrary dot_general layouts with the batch on the lane
axis).  Supports Matern smoothness in {1/2, 3/2, 5/2, inf} and RBF (static),
GENERAL smoothness via ``smoothness="gen"`` plus a
:mod:`muygpys_tpu.pallas.matern_nu` coefficient vector (an SMEM input, so
one executable serves every smoothness of a given shape), and multivariate
targets ``y (n, r, B)``.
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


def _matern(d, smoothness, gen_ref=None):
    if smoothness == "gen":
        from muygpys_tpu.pallas.matern_nu import NTAIL, matern_nu_eval

        # d is the ls-scaled l2 distance u; t = sqrt(2 nu) u with sqrt(2 nu)
        # in the coefficient vector's slot 0.  f32 serving trims the tail
        # Chebyshev to 28 terms: measured truncation <= 1.7e-8 absolute on
        # phi across nu in [0.05, 10] (r5 probe) — two orders below the
        # certified f32 serve budget (<= 4e-6 vs scipy) — for ~30% fewer
        # Clenshaw terms per element; f64 (conformance) keeps the full
        # series
        nt = 28 if d.dtype == jnp.float32 else NTAIL
        return matern_nu_eval(gen_ref[0] * d, gen_ref, tail_terms=nt)
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
    if smoothness == "rbf":
        # input is already the F2 distance scaled by 1/ls^2
        return jnp.exp(-d / 2.0)
    raise ValueError(
        f"pallas kernel supports smoothness 0.5/1.5/2.5/inf/'rbf', "
        f"got {smoothness}"
    )


def _solve_and_emit(K, kc, y, n, r, mean_ref, var_ref, work):
    """Shared tail: augmented-matrix Cholesky elimination -> mean/variance.

    Posterior moments only need ``z = L^{-1} [kc | y]`` (mean = zc . zy,
    var = 1 - zc . zc), never L itself or a back-substitution.  So instead
    of factor-then-substitute, eliminate the AUGMENTED matrix
    ``[K | kc | y]`` in a VMEM scratch: each pivot step is one divide + ONE
    contiguous fused multiply-subtract over the trailing block — no column
    restacking (the previous formulation rebuilt an (n, j) stack per step:
    O(n^3) pure shuffle traffic on top of the O(n^3) FLOPs; this version
    measured 3.4x faster end-to-end on v5e, PERF.md r2).
    """
    m = n + 1 + r
    work[:, :n, :] = K
    work[:, n, :] = kc
    work[:, n + 1:, :] = y
    for j in range(n):
        inv = jax.lax.rsqrt(work[j, j, :])  # (TB,)
        rowj = work[j, j:, :] * inv[None, :]  # (m - j, TB)
        work[j, j:, :] = rowj
        if j < n - 1:
            lcol = work[j + 1:, j, :] * inv[None, :]  # (n-1-j, TB)
            work[j + 1:, j:, :] = (
                work[j + 1:, j:, :] - lcol[:, None, :] * rowj[None, :, :]
            )
    zc = work[:, n, :]  # (n, TB) = L^{-1} kc
    zy = work[:, n + 1:, :]  # (n, r, TB) = L^{-1} y
    mean_ref[:] = jnp.sum(zc[:, None, :] * zy, axis=0)  # (r, TB)
    var_ref[0, :] = 1.0 - jnp.sum(zc * zc, axis=0)


def _kernel_body(
    smoothness, metric_power, params_ref, pw_ref, cw_ref, y_ref,
    *rest,
):
    if smoothness == "gen":
        gen_ref, mean_ref, var_ref, work = rest
    else:
        gen_ref = None
        mean_ref, var_ref, work = rest
    n = pw_ref.shape[0]
    r = y_ref.shape[1]
    ls = params_ref[0]
    noise = params_ref[1]
    pw = pw_ref[:]  # (n, n, TB)
    cw = cw_ref[:]  # (n, TB)
    y = y_ref[:]  # (n, r, TB)

    inv = 1.0 / ls if metric_power == 1 else 1.0 / (ls * ls)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(pw.dtype)[:, :, None]

    K = _matern(pw * inv, smoothness, gen_ref) + noise * eye  # (n, n, TB)
    kc = _matern(cw * inv, smoothness, gen_ref)  # (n, TB)
    _solve_and_emit(K, kc, y, n, r, mean_ref, var_ref, work)


def _coords_body(
    smoothness, metric_power, d_feat, hetero,
    params_ref, nf_ref, q_ref, y_ref, *rest,
):
    if smoothness == "gen":
        gen_ref, rest = rest[0], rest[1:]
    else:
        gen_ref = None
    if hetero:
        eps_ref, mean_ref, var_ref, work = rest
    else:
        mean_ref, var_ref, work = rest
    n = nf_ref.shape[0]
    r = y_ref.shape[1]
    nf = nf_ref[:]  # (n, d, TB)
    q = q_ref[:]  # (d, TB)
    y = y_ref[:]  # (n, r, TB)

    # in-VMEM distance assembly with per-feature length scaling (anisotropy
    # is the same program as isotropy with ls replicated across features)
    acc_p = None
    acc_c = None
    for f in range(d_feat):
        inv = 1.0 / params_ref[f]
        xf = nf[:, f, :] * inv  # (n, TB)
        qf = q[f][None, :] * inv  # (1, TB)
        dp = xf[:, None, :] - xf[None, :, :]  # (n, n, TB)
        dc = xf - qf  # (n, TB)
        sq_p = dp * dp
        sq_c = dc * dc
        acc_p = sq_p if acc_p is None else acc_p + sq_p
        acc_c = sq_c if acc_c is None else acc_c + sq_c
    if metric_power == 1:
        u_p = jnp.sqrt(acc_p)
        u_c = jnp.sqrt(acc_c)
    else:
        u_p, u_c = acc_p, acc_c

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(nf.dtype)[:, :, None]

    K = _matern(u_p, smoothness, gen_ref)
    if hetero:
        K = K + eye * eps_ref[:][:, None, :]  # per-neighbor nugget (n, TB)
    else:
        K = K + params_ref[d_feat] * eye
    kc = _matern(u_c, smoothness, gen_ref)
    _solve_and_emit(K, kc, y, n, r, mean_ref, var_ref, work)


@functools.partial(
    jax.jit,
    static_argnames=("smoothness", "metric_power", "batch_tile", "interpret"),
)
def fused_predict_bl(
    pw: jnp.ndarray,
    cw: jnp.ndarray,
    y: jnp.ndarray,
    params: jnp.ndarray,
    gen_coeffs=None,
    smoothness=1.5,
    metric_power: int = 1,
    batch_tile: int = 256,
    interpret: bool = False,
):
    """Posterior (mean, var) from batch-last distance tensors via one Pallas
    kernel.  ``pw (n, n, B)``, ``cw (n, B)``, ``y (n, B)`` or ``(n, r, B)``;
    ``params = [length_scale, noise]`` (traced — one executable serves every
    trained model).  B must be divisible by ``batch_tile``.  Unit prior
    variance (Kout = 1).  ``smoothness="gen"`` takes a
    :func:`muygpys_tpu.pallas.matern_nu.matern_nu_coeffs` vector in
    ``gen_coeffs`` (traced SMEM — any smoothness, one executable) and
    requires ``metric_power == 1``.

    Returns mean ``(r, B)`` and variance ``(B,)``.
    """
    n, _, B = pw.shape
    if y.ndim == 2:
        y = y[:, None, :]
    r = y.shape[1]
    if B % batch_tile != 0:
        raise ValueError(f"batch_tile {batch_tile} must divide batch {B}")
    params = jnp.asarray(params, pw.dtype)
    gen = smoothness == "gen"
    if gen and gen_coeffs is None:
        raise ValueError('smoothness="gen" requires gen_coeffs')
    if gen and metric_power != 1:
        raise ValueError('smoothness="gen" requires the l2 metric')
    if gen and batch_tile > 256:
        # the surrogate's Horner/Clenshaw temporaries overflow the 16M
        # VMEM scoped budget at the closed-form tile (measured 17.96M at
        # TB=512 on v5e)
        batch_tile = 256
        while B % batch_tile:
            batch_tile //= 2
    grid = (B // batch_tile,)

    kernel = functools.partial(_kernel_body, smoothness, metric_power)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params (2,)
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
    ]
    args = [params, pw, cw, y]
    if gen:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(gen_coeffs, pw.dtype))
    mean, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
        scratch_shapes=[
            pltpu.VMEM((n, n + 1 + r, batch_tile), pw.dtype),
        ],
        interpret=interpret,
    )(*args)
    return mean, var[0]


@functools.partial(
    jax.jit,
    static_argnames=("smoothness", "metric_power", "batch_tile", "interpret"),
)
def fused_predict_coords_bl(
    nf: jnp.ndarray,
    q: jnp.ndarray,
    y: jnp.ndarray,
    params: jnp.ndarray,
    noise_nn=None,
    gen_coeffs=None,
    smoothness=1.5,
    metric_power: int = 1,
    batch_tile: int = 512,
    interpret: bool = False,
):
    """Posterior (mean, var) streaming neighbor COORDINATES, not distances.

    ``nf (n, d, B)`` neighbor features, ``q (d, B)`` query features,
    ``y (n, B)`` or ``(n, r, B)`` neighbor targets,
    ``params = [ls_0, ..., ls_{d-1}, noise]`` (traced; replicate a scalar
    length scale across features for isotropy), optional
    ``noise_nn (n, B)`` per-neighbor heteroscedastic nugget (replaces the
    scalar noise when given).  ``metric_power`` 1 = l2, 2 = F2.
    ``smoothness="gen"`` takes a
    :func:`muygpys_tpu.pallas.matern_nu.matern_nu_coeffs` vector in
    ``gen_coeffs`` (traced SMEM scalars — any smoothness, one executable);
    requires ``metric_power == 1``.

    HBM bytes per prediction: ``(nd + d + nr) * 4`` vs the distance kernel's
    ``(n^2 + n + nr) * 4`` — ~12x less at (n=30, d=2, r=1).

    Returns mean ``(r, B)`` and variance ``(B,)``.
    """
    n, d_feat, B = nf.shape
    if y.ndim == 2:
        y = y[:, None, :]
    r = y.shape[1]
    if B % batch_tile != 0:
        raise ValueError(f"batch_tile {batch_tile} must divide batch {B}")
    params = jnp.asarray(params, nf.dtype)
    hetero = noise_nn is not None
    gen = smoothness == "gen"
    if gen and gen_coeffs is None:
        raise ValueError('smoothness="gen" requires gen_coeffs')
    if gen and metric_power != 1:
        raise ValueError('smoothness="gen" requires the l2 metric')
    if gen and batch_tile > 256:
        # the surrogate's Horner/Clenshaw temporaries overflowed the 16M
        # VMEM scoped budget at the closed-form tile with the full 40-term
        # series (measured 17.96M at TB=512 on v5e); the r5 28-term f32
        # trim fits at 512 but measures the same throughput (+0.3%,
        # within noise), so the conservative tile stays
        batch_tile = 256
        while B % batch_tile:
            batch_tile //= 2
    grid = (B // batch_tile,)

    kernel = functools.partial(
        _coords_body, smoothness, metric_power, d_feat, hetero
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params (d+1,)
        pl.BlockSpec(
            (n, d_feat, batch_tile), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (d_feat, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (n, r, batch_tile), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [params, nf, q, y]
    if gen:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(gen_coeffs, nf.dtype))
    if hetero:
        in_specs.append(
            pl.BlockSpec(
                (n, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
        args.append(jnp.asarray(noise_nn, nf.dtype))
    mean, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (r, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, B), nf.dtype),
            jax.ShapeDtypeStruct((1, B), nf.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n + 1 + r, batch_tile), nf.dtype),
        ],
        interpret=interpret,
    )(*args)
    return mean, var[0]
