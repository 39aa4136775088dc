"""Lane-layout LOO objective: the TPU production training fast path.

The generic objective (:mod:`muygpys_tpu.optimize.objective`) composes
arbitrary kernels/noises/scales over ``(B, n, n)`` tensors; on TPU the
batched solves in that layout run 5-10x below the batch-last formulation
(PERF.md).  This module assembles the common production configuration —
isotropic Matern (fixed or free smoothness), homoscedastic noise, analytic
scale, lool or mse loss — directly in the ``(n, n, B)`` lane layout of
:mod:`muygpys_tpu.ops.lanes_solver`, with ONE factorization shared by the
posterior mean, variance, and sigma^2, all under ``jax.value_and_grad``.

Drop-in with the chassis:

    obj_fn, names = make_fast_loo_objective(model, bt, bnt, cw, pw)
    model = L_BFGS_B_optimize._fn(model, obj_fn)   # or use directly
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from muygpys_tpu.gp.deformation import Isotropy
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.noise import HomoscedasticNoise
from muygpys_tpu.ops import kernels as _k
from muygpys_tpu.ops.lanes_solver import cholesky_bl, tri_solve_fwd_bl


def _matern_eval(smoothness_fixed, nu_val):
    if smoothness_fixed:
        if nu_val == 0.5:
            return lambda d, nu: _k.matern_05_fn(d)
        if nu_val == 1.5:
            return lambda d, nu: _k.matern_15_fn(d)
        if nu_val == 2.5:
            return lambda d, nu: _k.matern_25_fn(d)
        if nu_val == math.inf:
            return lambda d, nu: _k.matern_inf_fn(d)
    return _k.matern_gen_fn


def make_fast_loo_objective(
    muygps,
    batch_targets,
    batch_nn_targets,
    crosswise_dists,
    pairwise_dists,
    loss: str = "lool",
) -> Tuple[Callable, list]:
    """Build ``obj_fn(params_dict) -> -loss`` in lane layout.

    Args:
        muygps: a MuyGPS with Matern/RBF + Isotropy + HomoscedasticNoise.
        batch_targets: ``(B, r)`` or ``(B,)``.
        batch_nn_targets: ``(B, n, r)`` or ``(B, n)``.
        crosswise_dists / pairwise_dists: standard-layout distance tensors
            ``(B, n)`` / ``(B, n, n)`` (as produced by make_train_tensors
            with an isotropic deformation).

    Returns:
        (obj_fn, free_param_names); obj_fn takes a dict of free parameters
        (a JAX pytree — jit/grad-ready) and returns the negated loss,
        maximization-convention like the generic objective.
    """
    kernel = muygps.kernel
    if not isinstance(kernel, (Matern, RBF)):
        raise ValueError(
            f"fast objective supports Matern/RBF kernels, not {type(kernel)}"
        )
    if not isinstance(kernel.deformation, Isotropy):
        raise ValueError(
            "fast objective requires an isotropic deformation, not "
            f"{type(kernel.deformation)}"
        )
    if not isinstance(muygps.noise, HomoscedasticNoise):
        raise ValueError(
            "fast objective requires homoscedastic noise, not "
            f"{type(muygps.noise)}"
        )
    if loss not in ("lool", "mse"):
        raise ValueError(f"fast objective supports lool/mse, not {loss!r}")

    apply_ls = kernel.deformation.metric.apply_length_scale
    is_rbf = isinstance(kernel, RBF)
    if is_rbf:
        nu_fixed, nu0 = True, math.inf
        kfn = lambda d, nu: _k.rbf_fn(d)  # noqa: E731
    else:
        nu_fixed = kernel.smoothness.fixed()
        nu0 = float(kernel.smoothness())
        kfn = _matern_eval(nu_fixed, nu0)

    names, x0, _ = muygps.get_opt_params()

    # one-time layout change: batch to the lane axis
    pw_bl = jnp.transpose(jnp.asarray(pairwise_dists), (1, 2, 0))
    cw_bl = jnp.transpose(jnp.asarray(crosswise_dists), (1, 0))
    y = jnp.asarray(batch_nn_targets)
    if y.ndim == 2:
        y = y[:, :, None]
    y_bl = jnp.transpose(y, (1, 2, 0))  # (n, r, B)
    t = jnp.asarray(batch_targets)
    if t.ndim == 1:
        t = t[:, None]
    t_bl = jnp.transpose(t, (1, 0))  # (r, B)

    n, _, B = pw_bl.shape
    eye_bl = jnp.eye(n, dtype=pw_bl.dtype)[:, :, None]
    noise0 = float(muygps.noise())
    ls0 = float(kernel.deformation.length_scale())

    # reference semantics quirk mirrored exactly: inside the objective the
    # analytic sigma^2 perturbs Kin with the model's STORED noise, not the
    # proposed one (reference gp/hyperparameter/scale.py:205
    # ``muygps.noise.perturb(Kin)`` — no kwarg).  When noise is a free
    # parameter this costs a second factorization; otherwise the main factor
    # is reused.
    noise_is_free = "noise" in names

    def obj_fn(params):
        ls = params.get("length_scale", ls0)
        nu = params.get("smoothness", nu0)
        noise = params.get("noise", noise0)

        Kraw = kfn(apply_ls(pw_bl, ls), nu)
        Kin = Kraw + noise * eye_bl
        Kcross = kfn(apply_ls(cw_bl, ls), nu)  # (n, B)

        L = cholesky_bl(Kin)
        rhs = jnp.concatenate([Kcross[:, None, :], y_bl], axis=1)
        Z = tri_solve_fwd_bl(L, rhs)  # (n, 1+r, B) = L^{-1}[Kc, Y]
        zc = Z[:, 0, :]  # L^{-1} Kcross
        zy = Z[:, 1:, :]  # L^{-1} Y

        mean = jnp.einsum("nb,nrb->rb", zc, zy)  # Kc^T Kin^{-1} Y
        var = 1.0 - jnp.einsum("nb,nb->b", zc, zc)
        if loss == "mse":
            return -jnp.sum((mean - t_bl) ** 2) / t_bl.size
        if noise_is_free:
            L0 = cholesky_bl(Kraw + noise0 * eye_bl)
            zy0 = tri_solve_fwd_bl(L0, y_bl)
        else:
            zy0 = zy
        scale = jnp.sum(zy0 * zy0) / (B * n)  # analytic sigma^2
        # f32 floor: near-singular neighborhoods round var slightly negative
        # and log() would NaN the objective (see ops/loss._floor_variances)
        sv = jnp.maximum(
            scale * var, 10.0 * jnp.finfo(var.dtype).eps
        )  # (B,)
        return -jnp.sum((mean - t_bl) ** 2 / sv[None, :] + jnp.log(sv))

    return obj_fn, names
