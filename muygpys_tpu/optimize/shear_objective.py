"""Fast LOO objective for the lensing shear family.

The generic composed objective evaluates the shear family (reference
``gp/kernels/experimental/shear.py:60-265``) through separate
``posterior_mean`` / ``posterior_variance`` functors — TWO (three with an
analytic scale) independent batched Cholesky factorizations of the same
``(I*nn, I*nn)`` observation blocks per objective evaluation, each through
XLA's batched-LAPACK custom call (the layout the lanes-solver header
measured 5-10x slow at small blocks).  This module assembles the shear LOO
objective with ONE factorization shared by the posterior mean and the full
``(O, O)`` covariance, in either solver layout:

- ``layout="lanes"``: the unrolled batch-on-lanes block elimination
  (:mod:`muygpys_tpu.ops.lanes_solver`) — fastest per evaluation;
  compile-once host-loop chassis territory (the jaxpr grows with
  ``I*nn``).
- ``layout="batched"``: one flattened ``(B, m, m)``
  ``jnp.linalg.cholesky`` + a single stacked triangular solve — an
  O(1)-size jaxpr safe to inline into the device trainer's
  ``lax.while_loop`` line search (:mod:`muygpys_tpu.optimize.
  device_chassis` routes shear models here automatically).

Losses: ``"mse"`` on the posterior mean (the reference's shear training
config) and ``"lool"`` — the MULTIVARIATE leave-one-out likelihood over
the full ``(O, O)`` posterior covariance blocks
(:func:`muygpys_tpu.ops.loss.lool_fn_unscaled` slogdet semantics).

Maximization sign convention, same as every other objective builder.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from muygpys_tpu.gp.kernels.experimental import (
    ShearKernel,
    ShearKernel2in3out,
)


def shear_objective_supports(muygps, loss: str = "mse") -> bool:
    """True iff :func:`make_shear_loo_objective` covers this model —
    the chassis use this to pick the shared-factorization shear assembly
    over the generic composed objective.

    ``loss="lool"`` additionally requires a FIXED scale: the assembly
    bakes the model's stored scale into the covariance, whereas the
    generic objective re-estimates an :class:`AnalyticScale` at every
    evaluation (``make_var_predict_and_loss_fn`` calls ``scale_fn`` per
    proposal) — routing an AnalyticScale model here would silently train
    a different objective (r5 review finding).  ``"mse"`` is mean-only
    and scale-free, so any scale functor is fine."""
    if not isinstance(muygps.kernel, (ShearKernel, ShearKernel2in3out)):
        return False
    if loss == "mse":
        return True
    if loss != "lool":
        return False
    from muygpys_tpu.gp.hyperparameter import FixedScale

    return isinstance(muygps.scale, FixedScale)


def make_shear_loo_objective(
    muygps,
    batch_targets,
    batch_nn_targets,
    crosswise_diffs,
    pairwise_diffs,
    loss: str = "mse",
    layout: str = "lanes",
) -> Tuple[Callable, List[str]]:
    """Build ``obj_fn(params_dict) -> -loss`` for a shear-family model.

    Args:
        muygps: MuyGPS with a :class:`ShearKernel` or
            :class:`ShearKernel2in3out` (DifferenceIsotropy deformation,
            Homoscedastic/ShearNoise33 noise, fixed scale).
        batch_targets: ``(B, O)`` observed outputs at the batch points.
        batch_nn_targets: ``(B, I, nn)`` flattened neighbor observations
            (the layout the shear posterior consumes).
        crosswise_diffs / pairwise_diffs: the deformation's difference
            tensors ``(B, nn, 2)`` / ``(B, nn, nn, 2)``.

    Returns (obj_fn, free_param_names).
    """
    if not shear_objective_supports(muygps, loss):
        raise ValueError(
            f"shear objective supports ShearKernel/ShearKernel2in3out "
            f"with loss mse/lool; got {type(muygps.kernel)} / {loss!r}"
        )
    if layout not in ("lanes", "batched"):
        raise ValueError(f"unknown layout {layout!r}")

    kernel = muygps.kernel
    Kout = jnp.asarray(kernel.Kout())
    names, _, _ = muygps.get_opt_params()
    ls0 = float(kernel.deformation.length_scale())
    noise0 = float(muygps.noise())
    scale = jnp.asarray(muygps.scale())
    scale = scale.reshape(-1)[0]

    bt = jnp.asarray(batch_targets)
    bnt = jnp.asarray(batch_nn_targets)
    cw = jnp.asarray(crosswise_diffs)
    pw = jnp.asarray(pairwise_diffs)
    B, I, nn = bnt.shape
    m = I * nn
    o = Kout.shape[0]

    if layout == "lanes":
        from muygpys_tpu.ops.lanes_solver import (
            multiout_serve_mean_and_variance,
        )

    def obj_fn(params):
        ls = params.get("length_scale", ls0)
        noise = params.get("noise", noise0)
        Kin = kernel(pw, length_scale=ls)  # (B, I, nn, I, nn)
        Kcross = kernel(cw, length_scale=ls)  # (B, I, nn, O)
        Kp = muygps.noise.perturb(Kin, noise=noise)
        if layout == "lanes":
            # the lanes engine's own frontend (shared layout shim —
            # never duplicate it, r5 review)
            mean, cov = multiout_serve_mean_and_variance(
                Kp, Kcross, Kout, bnt
            )
        else:
            Kf = Kp.reshape(B, m, m)
            Kc = Kcross.reshape(B, m, o)
            y = bnt.reshape(B, m)
            L = jnp.linalg.cholesky(Kf)
            Z = solve_triangular(
                L, jnp.concatenate([Kc, y[:, :, None]], axis=2), lower=True
            )  # (B, m, o+1) — ONE factorization, one stacked substitution
            zc = Z[:, :, :o]
            zy = Z[:, :, o]
            mean = jnp.einsum("bmo,bm->bo", zc, zy)
            cov = Kout[None] - jnp.einsum("bmo,bmp->bop", zc, zc)
        if loss == "mse":
            return -jnp.sum((mean - bt) ** 2) / bt.size
        # multivariate lool: quad + slogdet over the scaled (O, O) blocks
        from muygpys_tpu.ops.loss import lool_fn_unscaled

        return -lool_fn_unscaled(mean, bt, scale * cov)

    return obj_fn, list(names)
