"""Fused-objective L-BFGS-B chassis: the production training fast path.

Same result contract as :data:`muygpys_tpu.optimize.L_BFGS_B_optimize` for
the common production model (Matern/RBF + Isotropy + homoscedastic noise,
loss in {lool, mse, looph, huber}), but the objective is evaluated by the
lane-layout fast
objective (:mod:`muygpys_tpu.optimize.fast_objective`, ~4.5x the generic
chassis) or the single fused Pallas kernel that returns value AND analytic
gradient in one VMEM pass (:mod:`muygpys_tpu.pallas.fused_train`; see
PERF.md for the measured ladder).

    model = Fused_L_BFGS_B_optimize(model, bt, bnt, cw, pw, loss="lool")

``engine``:
    "pallas" — fused kernel (incl. FREE smoothness via the traced-nu
               surrogate with analytic d/dnu rows, r4, and ANISOTROPY via
               per-feature derivative groups, r5); falls back to "lanes"
               for capabilities the kernel doesn't lower (hierarchical
               length scales).
    "lanes"  — lane-layout XLA objective under jit(value_and_grad).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.optimize import bijectors
from muygpys_tpu.optimize.chassis import _get_opt_lists, _new_muygps
from muygpys_tpu.optimize.fast_objective import make_fast_loo_objective


def Fused_L_BFGS_B_optimize(
    muygps: MuyGPS,
    batch_targets,
    batch_nn_targets,
    crosswise_dists,
    pairwise_dists,
    loss: str = "lool",
    engine: str = "pallas",
    verbose: bool = False,
    interpret: Optional[bool] = None,
    **kwargs,
) -> MuyGPS:
    """L-BFGS-B over the fused LOO objective; returns the optimized model."""
    from scipy import optimize as opt

    if engine not in ("pallas", "lanes"):
        raise ValueError(f"unknown engine {engine!r}")
    if interpret is None:
        # Mosaic only lowers on TPU; interpret keeps the engine usable (if
        # slow) for CPU development and tests
        interpret = jax.default_backend() == "cpu"

    x0_names, x0, bounds = _get_opt_lists(muygps, verbose=verbose)

    vag = None
    from muygpys_tpu.optimize.shear_objective import (
        make_shear_loo_objective,
        shear_objective_supports,
    )

    if shear_objective_supports(muygps, loss):
        # shear family: the shared-factorization assembly in the BATCHED
        # layout (the lanes layout's reverse-mode transposes 6.6x slower
        # and overflows VMEM at production batches — PERF.md r5)
        obj_fn, _ = make_shear_loo_objective(
            muygps, batch_targets, batch_nn_targets,
            crosswise_dists, pairwise_dists, loss=loss, layout="batched",
        )
        vag = jax.jit(jax.value_and_grad(obj_fn))
    if vag is None and engine == "pallas":
        from muygpys_tpu.pallas.fused_train import make_fused_train_objective

        try:
            vag, _ = make_fused_train_objective(
                muygps, batch_targets, batch_nn_targets,
                crosswise_dists, pairwise_dists, loss=loss,
                interpret=interpret,
            )
            # probe: lowering errors surface at first call, not build time
            v0, g0 = vag({n: x0[i] for i, n in enumerate(x0_names)})
            ok = np.isfinite(float(v0)) and all(
                np.isfinite(float(g0.get(n, 0.0))) for n in x0_names
            )
            if not ok:
                raise ValueError("non-finite probe value/gradient")
        except Exception as e:  # noqa: BLE001 — any lowering failure
            vag = None
            if verbose:
                print(f"pallas engine unavailable ({e}); using lanes")
    if vag is None:
        obj_fn, _ = make_fast_loo_objective(
            muygps, batch_targets, batch_nn_targets,
            crosswise_dists, pairwise_dists, loss=loss,
        )
        vag = jax.jit(jax.value_and_grad(obj_fn))

    # probe at x0 on EVERY engine: with a non-finite initial objective the
    # NaN-safe `fun` below would return (1e12, 0) and L-BFGS-B would
    # immediately "converge" at x0, silently returning the unoptimized model
    v0, g0 = vag({n: x0[i] for i, n in enumerate(x0_names)})
    if not (
        np.isfinite(float(v0))
        and all(np.isfinite(float(g0.get(n, 0.0))) for n in x0_names)
    ):
        raise ValueError(
            f"fused objective is non-finite at the initial point "
            f"(value={float(v0)!r}); check the model's initial "
            "hyperparameters, or use the generic L_BFGS_B_optimize chassis "
            "(it falls back to derivative-free search)"
        )

    # optimize in unconstrained z-space (bijector chain rule applied to the
    # engines' theta-space gradients on the host; chassis.py rationale)
    lo, hi = bounds[:, 0], bounds[:, 1]
    z0 = bijectors.inverse_np(x0, lo, hi)

    def fun(z):
        theta = bijectors.forward_np(z, lo, hi)
        v, g = vag({n: theta[i] for i, n in enumerate(x0_names)})
        fv = float(v)
        gt = np.array([float(g.get(n, 0.0)) for n in x0_names])
        gz = gt * bijectors.dforward_dz_np(z, lo, hi)
        if not (np.isfinite(fv) and np.all(np.isfinite(gz))):
            # NaN-safe line search: see chassis._scipy_optimize
            return 1e12, np.zeros_like(gz)
        return -fv, -gz

    optres = opt.minimize(fun, z0, method="L-BFGS-B", jac=True, **kwargs)
    if verbose:
        print(f"optimizer results: \n{optres}")
    theta = bijectors.forward_np(optres.x, lo, hi)
    ret = {n: theta[i] for i, n in enumerate(x0_names)}
    return _new_muygps(muygps, x0_names, bounds, ret)
