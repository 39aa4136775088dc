"""On-device L-BFGS chassis: the whole training trajectory in ONE program.

The scipy-driven chassis (:func:`muygpys_tpu.optimize.L_BFGS_B_optimize`,
:func:`muygpys_tpu.optimize.fused_chassis.Fused_L_BFGS_B_optimize`) evaluate
the jitted objective from a host loop, paying one host<->device round trip
per L-BFGS iteration (~33 ms each through the axon relay — PERF.md), so a
40-iteration training run is >1 s of wall clock regardless of how fast the
objective kernel is (0.115 ms for the fused Pallas value+grad).

This chassis instead runs optax's L-BFGS (two-loop recursion + zoom line
search) inside a single ``jax.lax.while_loop`` under one ``jit``: the entire
hyperparameter optimization — every line-search probe included — is one XLA
program and one relay round trip.  Convergence semantics mirror scipy's
L-BFGS-B defaults (stop on gradient sup-norm or relative objective decrease;
``ftol``/``gtol``/``maxiter`` have the same meaning), and the same
unconstrained scaled-sigmoid reparameterization keeps every proposal inside
the reference's box bounds structurally (SURVEY §7 delta 2; reference bounds
semantics: ``gp/hyperparameter/scalar.py:208-267``,
``_src/optimize/chassis/numpy.py:57-81``).

Under a sharded objective the compiled loop is replicated by construction —
every host traces the identical program and the psum-reduced objective keeps
the trajectories in lockstep, exactly the reference's replicated-optimizer
MPI discipline (``_src/optimize/chassis/jax.py:14-20``) without the
per-iteration allreduce-to-host.

Entry points:

- :data:`Device_LBFGS_optimize` — ``OptimizeFn`` over the generic LOO
  objective: every model class the gradient chassis supports (anisotropy,
  shear, hierarchical parameters, any loss) trains fully on device.
- :func:`Fused_Device_LBFGS_optimize` — the production fast path: the
  lane-layout objective or the fused Pallas value+analytic-gradient kernel
  (wrapped in ``jax.custom_vjp`` so the line search differentiates it like
  any other function), selected exactly like
  :func:`~muygpys_tpu.optimize.fused_chassis.Fused_L_BFGS_B_optimize`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.optimize import bijectors
from muygpys_tpu.optimize.chassis import (
    L_BFGS_B_optimize,
    OptimizeFn,
    _get_opt_lists,
    _new_muygps,
)
from muygpys_tpu.optimize.objective import make_loo_crossval_fn

_BIG = 1e12  # finite penalty for NaN/inf proposals: line search backtracks


def lbfgs_while_loop(
    fun: Callable,
    z0,
    maxiter: int = 200,
    gtol: float = 1e-7,
    ftol: float = 2.22e-9,
    memory_size: int = 15,
):
    """The traced L-BFGS trajectory: ``(z_final, iters, value, gmax)``.

    Pure traced values — compose this inside a larger ``jit`` (e.g. a
    tensor-parameterized trainer, :func:`make_device_trainer`).  Stopping
    mirrors scipy L-BFGS-B: sup-norm of the gradient below ``gtol``, or
    relative objective decrease below ``ftol`` (scipy default
    ``2.22e-9 = factr * eps``), or ``maxiter`` iterations.
    """
    import optax
    import optax.tree_utils as otu

    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state, _prev = carry
        value, grad = value_and_grad(params, state=state)
        # NaN-safe: a non-finite probe (f32 Cholesky on a numerically
        # singular proposal) becomes a large finite value with zero
        # gradient, so the line search backtracks instead of poisoning the
        # two-loop history (same contract as chassis._scipy_optimize)
        value = _finite_or_big(value)
        grad = jax.tree.map(
            lambda g: jnp.nan_to_num(g, posinf=0.0, neginf=0.0), grad
        )
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        params = optax.apply_updates(params, updates)
        return params, state, value

    def cont(carry):
        _, state, prev = carry
        it = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        value = otu.tree_get(state, "value")
        gmax = otu.tree_max(jax.tree.map(jnp.abs, grad))
        frel = (prev - value) / jnp.maximum(
            jnp.maximum(jnp.abs(prev), jnp.abs(value)), 1.0
        )
        return (it == 0) | (
            (it < maxiter) & (gmax >= gtol) & (frel >= ftol)
        )

    state0 = opt.init(z0)
    # carry dtype must match the objective's value dtype exactly
    big = jnp.full((), _BIG, dtype=jax.eval_shape(fun, z0).dtype)
    zf, state, _ = jax.lax.while_loop(cont, step, (z0, state0, big))
    return (
        zf,
        otu.tree_get(state, "count"),
        otu.tree_get(state, "value"),
        otu.tree_max(jax.tree.map(jnp.abs, otu.tree_get(state, "grad"))),
    )


def device_lbfgs(
    fun: Callable,
    z0,
    maxiter: int = 200,
    gtol: float = 1e-7,
    ftol: float = 2.22e-9,
    memory_size: int = 15,
):
    """Minimize ``fun(pytree) -> scalar`` in one jitted ``while_loop``.

    Returns ``(z_final, info)`` where ``info`` is a dict of scalars
    (``iterations``, ``value``, ``grad_norm``) already on the host.
    """
    zf, it, value, gmax = jax.jit(
        lambda z: lbfgs_while_loop(
            fun, z, maxiter=maxiter, gtol=gtol, ftol=ftol,
            memory_size=memory_size,
        )
    )(z0)
    info = {
        "iterations": int(it),
        "value": float(value),
        "grad_norm": float(gmax),
    }
    return zf, info


def _finite_or_big(v):
    """NaN-safe objective: non-finite proposals become a large finite value
    with (autodiff) zero gradient, so the zoom line search backtracks
    instead of poisoning the two-loop history (same contract as the scipy
    chassis' NaN guard, ``chassis._scipy_optimize``)."""
    ok = jnp.isfinite(v)
    safe = jnp.where(ok, v, 0.0)
    return jnp.where(ok, safe, jnp.asarray(_BIG, v.dtype))


def _device_lbfgs_optimize(
    muygps: MuyGPS,
    obj_fn: Callable,
    verbose: bool = False,
    maxiter: int = 200,
    gtol: float = 1e-7,
    ftol: float = 2.22e-9,
    **kwargs,
) -> MuyGPS:
    """Generic-objective on-device L-BFGS (maximization convention)."""
    x0_names, x0, bounds = _get_opt_lists(muygps, verbose=verbose)
    to_theta, to_z = bijectors.make_param_bijector(x0_names, bounds)

    def fun(zdict):
        return _finite_or_big(-obj_fn(**to_theta(zdict)))

    z0 = {
        n: jnp.asarray(z)
        for n, z in to_z({n: x0[i] for i, n in enumerate(x0_names)}).items()
    }
    zf, info = device_lbfgs(
        fun, z0, maxiter=maxiter, gtol=gtol, ftol=ftol
    )
    if verbose:
        print(f"device lbfgs: {info}")
    params = {n: float(v) for n, v in to_theta(zf).items()}
    return _new_muygps(muygps, x0_names, bounds, params)


Device_LBFGS_optimize = OptimizeFn(_device_lbfgs_optimize, make_loo_crossval_fn)
"""Fully on-device L-BFGS chassis over the generic LOO objective."""


def make_device_trainer(
    muygps: MuyGPS,
    loss: str = "lool",
    maxiter: int = 200,
    gtol: float = 1e-7,
    ftol: float = 2.22e-9,
    memory_size: int = 15,
    verbose: bool = False,
) -> Callable:
    """Tensor-parameterized on-device trainer: compile ONCE, train every
    same-shaped batch at device speed.

    Returns ``trainer(batch_targets, batch_nn_targets, crosswise_dists,
    pairwise_dists, z_init=None) -> (MuyGPS, info)``.  The batch tensors are
    traced ARGUMENTS of one cached jitted program (the chassis functions
    instead close over them, so every new batch re-traces), which is the
    natural shape for epoch training: resample the batch, call the trainer,
    pay zero recompilation.  This subsumes the reference's mini-batch
    experimental chassis inner loop
    (reference optimize/experimental/chassis.py:46-319) with a full L-BFGS
    trajectory per epoch rather than one optimizer step.

    ``info["z"]`` is the final unconstrained iterate — pass it as ``z_init``
    on the next epoch to warm-start.  Uses the batched-Cholesky XLA
    objective (``layout="batched"``) for Matern/RBF x Isotropy/Anisotropy
    x homo/heteroscedastic noise x hierarchical (nonstationary) length
    scales (pass ``batch_features`` per epoch — the knot-value field
    trains on device, r3 VERDICT weak #6), loss in {lool, mse, looph,
    huber/pseudo_huber}.  SHEAR models route to the shared-factorization
    shear assembly (:mod:`muygpys_tpu.optimize.shear_objective` — one
    flattened block Cholesky per evaluation, r5); model classes outside
    both fast assemblies (NullDeformation, exotic losses) fall back to
    the GENERIC composed objective inside the SAME compile-once trainer
    — every supported model class epoch-trains at device speed (r4).
    """
    from muygpys_tpu.optimize.fast_objective import make_fast_loo_objective
    from muygpys_tpu.optimize.loss import LossFn

    x0_names, x0, bounds = _get_opt_lists(muygps, verbose=verbose)
    to_theta, to_z = bijectors.make_param_bijector(x0_names, bounds)
    # strongly-typed z: a weakly-typed default vs the strongly-typed
    # while_loop output must not count as two jit signatures
    zdt = jnp.result_type(float)
    z0_default = {
        n: jnp.asarray(z, dtype=zdt)
        for n, z in to_z({n: x0[i] for i, n in enumerate(x0_names)}).items()
    }

    # once on host: does the fast objective cover this model class?
    if isinstance(loss, LossFn):
        loss_obj, loss = loss, loss.name.removesuffix("_fn")
    else:
        from muygpys_tpu.optimize import loss as _loss_mod

        fn_name = {"huber": "pseudo_huber"}.get(loss, loss)
        loss_obj = getattr(_loss_mod, f"{fn_name}_fn", None)
        if loss_obj is not None and not isinstance(loss_obj, LossFn):
            loss_obj = None
    from muygpys_tpu.optimize.fast_objective import fast_objective_supports
    from muygpys_tpu.optimize.shear_objective import (
        make_shear_loo_objective,
        shear_objective_supports,
    )

    use_fast = fast_objective_supports(muygps, loss)
    # shear models train through the shared-factorization shear assembly
    # (ONE flattened block Cholesky per evaluation vs the generic
    # composed objective's two/three — r5; r4 trained shear through the
    # generic fallback)
    use_shear = (not use_fast) and shear_objective_supports(muygps, loss)
    if not (use_fast or use_shear) and loss_obj is None:
        raise ValueError(
            f"loss {loss!r} has no generic LossFn for the fallback"
        )

    @jax.jit
    def run(z0, bt, bnt, cw, pw, bf):
        if use_fast:
            obj_fn, _ = make_fast_loo_objective(
                muygps, bt, bnt, cw, pw, loss=loss, layout="batched",
                batch_features=bf,
            )
        elif use_shear:
            obj_fn, _ = make_shear_loo_objective(
                muygps, bt, bnt, cw, pw, loss=loss, layout="batched",
            )
        else:
            # generic composed objective (single-HLO solves — while_loop
            # safe); reached by model/loss combos outside both fast
            # assemblies (NullDeformation, exotic losses, shear x
            # non-fixed-scale lool)
            obj_raw = L_BFGS_B_optimize.make_obj_fn(
                muygps, bt, bnt, cw, pw, batch_features=bf,
                loss_fn=loss_obj,
            )

            def obj_fn(theta):
                return obj_raw(**theta)

        def fun(z):
            return _finite_or_big(-obj_fn(to_theta(z)))

        return lbfgs_while_loop(
            fun, z0, maxiter=maxiter, gtol=gtol, ftol=ftol,
            memory_size=memory_size,
        )

    def trainer(
        batch_targets,
        batch_nn_targets,
        crosswise_dists,
        pairwise_dists,
        z_init=None,
        batch_features=None,
    ):
        if z_init is None:
            z0 = z0_default
        else:
            z0 = jax.tree.map(
                lambda a: jnp.asarray(a, dtype=zdt), z_init
            )
        zf, it, value, gmax = run(
            z0, batch_targets, batch_nn_targets,
            crosswise_dists, pairwise_dists, batch_features,
        )
        info = {
            "iterations": int(it),
            "value": float(value),
            "grad_norm": float(gmax),
            "z": zf,
        }
        if verbose:
            print(f"device trainer: {info}")
        params = {n: float(v) for n, v in to_theta(zf).items()}
        return _new_muygps(muygps, x0_names, bounds, params), info

    trainer._jitted = run  # exposed for cache-hit introspection/tests
    return trainer


def Fused_Device_LBFGS_optimize(
    muygps: MuyGPS,
    batch_targets,
    batch_nn_targets,
    crosswise_dists,
    pairwise_dists,
    loss: str = "lool",
    engine: str = "pallas",
    verbose: bool = False,
    interpret: Optional[bool] = None,
    maxiter: int = 200,
    gtol: float = 1e-7,
    ftol: float = 2.22e-9,
    **kwargs,
) -> MuyGPS:
    """Fused-objective on-device L-BFGS: one compiled program end to end.

    Engine selection matches
    :func:`~muygpys_tpu.optimize.fused_chassis.Fused_L_BFGS_B_optimize`:
    ``"pallas"`` uses the fused value+analytic-gradient kernel
    (:mod:`muygpys_tpu.pallas.fused_train`) wrapped in ``jax.custom_vjp`` so
    ``optax``'s line search can differentiate it — including FREE smoothness
    (traced-nu surrogate, analytic d/dnu rows) and ANISOTROPY (per-feature
    derivative groups, r5); unsupported configurations (hierarchical
    length scales) fall back to the batched-Cholesky XLA objective
    (``layout="batched"`` — the unrolled lanes jaxpr would blow up
    while_loop compile time, so it stays in the host-loop chassis).
    """
    from muygpys_tpu.optimize.fast_objective import make_fast_loo_objective

    if engine not in ("pallas", "lanes"):
        raise ValueError(f"unknown engine {engine!r}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    x0_names, x0, bounds = _get_opt_lists(muygps, verbose=verbose)
    to_theta, to_z = bijectors.make_param_bijector(x0_names, bounds)

    theta_value = None
    from muygpys_tpu.optimize.shear_objective import (
        make_shear_loo_objective,
        shear_objective_supports,
    )

    if shear_objective_supports(muygps, loss):
        # shear family: shared-factorization assembly, batched layout
        # (while_loop-safe single-HLO Cholesky; PERF.md r5)
        obj_fn_shear, _ = make_shear_loo_objective(
            muygps, batch_targets, batch_nn_targets,
            crosswise_dists, pairwise_dists, loss=loss, layout="batched",
        )

        def theta_value(theta_dict):
            return obj_fn_shear(theta_dict)

    if theta_value is None and engine == "pallas":
        from muygpys_tpu.pallas.fused_train import (
            make_fused_train_objective,
        )

        try:
            vag, _ = make_fused_train_objective(
                muygps, batch_targets, batch_nn_targets,
                crosswise_dists, pairwise_dists, loss=loss,
                interpret=interpret,
            )
            v0, g0 = vag({n: x0[i] for i, n in enumerate(x0_names)})
            if not (
                np.isfinite(float(v0))
                and all(
                    np.isfinite(float(g0.get(n, 0.0))) for n in x0_names
                )
            ):
                raise ValueError("non-finite probe value/gradient")

            # analytic-gradient kernel as a differentiable function: the
            # forward pass IS the value+grad pass, the VJP is a dot with
            # the stored gradients — value_and_grad costs ONE kernel call
            @jax.custom_vjp
            def theta_value(theta_dict):
                v, _ = vag(theta_dict)
                return v

            def _fwd(theta_dict):
                v, g = vag(theta_dict)
                return v, (g, theta_dict)

            def _bwd(res, ct):
                g, theta_dict = res
                return (
                    {
                        n: ct * g.get(n, jnp.zeros_like(t))
                        for n, t in theta_dict.items()
                    },
                )

            theta_value.defvjp(_fwd, _bwd)
        except Exception as e:  # noqa: BLE001 — any lowering failure
            theta_value = None
            if verbose:
                print(f"pallas engine unavailable ({e}); using lanes")

    if theta_value is None:
        # batched layout, NOT lanes: the unrolled lanes solver's jaxpr grows
        # with n and gets inlined several times into the zoom line search's
        # while_loop body — compile time explodes.  The single-HLO batched
        # Cholesky keeps the loop body O(1)-size.
        obj_fn, _ = make_fast_loo_objective(
            muygps, batch_targets, batch_nn_targets,
            crosswise_dists, pairwise_dists, loss=loss, layout="batched",
        )

        def theta_value(theta_dict):
            return obj_fn(theta_dict)

    def fun(zdict):
        return _finite_or_big(-theta_value(to_theta(zdict)))

    z0 = {
        n: jnp.asarray(z)
        for n, z in to_z({n: x0[i] for i, n in enumerate(x0_names)}).items()
    }
    zf, info = device_lbfgs(
        fun, z0, maxiter=maxiter, gtol=gtol, ftol=ftol
    )
    if verbose:
        print(f"device lbfgs ({engine}): {info}")
    params = {n: float(v) for n, v in to_theta(zf).items()}
    return _new_muygps(muygps, x0_names, bounds, params)
