"""Lane-layout LOO objective: the TPU production training fast path.

The generic objective (:mod:`muygpys_tpu.optimize.objective`) composes
arbitrary kernels/noises/scales over ``(B, n, n)`` tensors; on TPU the
batched solves in that layout run 5-10x below the batch-last formulation
(PERF.md).  This module assembles the production configurations directly in
the ``(n, n, B)`` lane layout of :mod:`muygpys_tpu.ops.lanes_solver`, with
ONE factorization shared by the posterior mean, variance, and sigma^2, all
under ``jax.value_and_grad``.

Model class covered (the full scientific surface, not just the narrowest
case — r1 VERDICT missing #6):

- kernels: Matern with fixed nu in {1/2, 3/2, 5/2, inf} (closed forms),
  Matern with FREE nu (differentiable Bessel K_nu, :mod:`ops.bessel`), RBF;
- deformations: Isotropy (scalar length scale) and Anisotropy (per-feature
  length scales, free or fixed — reference ``gp/deformation/anisotropy.py``);
- noise: homoscedastic (scalar, optionally free) and heteroscedastic
  (per-neighbor tensor, always fixed — reference
  ``_src/gp/noise/numpy.py:56-67``);
- losses: lool, mse, looph, huber (unnormalized pseudo-Huber on the mean,
  reference ``optimize/loss.py`` pseudo_huber).

Drop-in with the chassis:

    obj_fn, names = make_fast_loo_objective(model, bt, bnt, cw, pw)
    model = L_BFGS_B_optimize._fn(model, obj_fn)   # or use directly
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from muygpys_tpu.gp.deformation import Anisotropy, Isotropy
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.noise import HeteroscedasticNoise, HomoscedasticNoise
from muygpys_tpu.ops import kernels as _k
from muygpys_tpu.ops.lanes_solver import cholesky_bl, tri_solve_fwd_bl
from muygpys_tpu.ops.tensors import safe_sqrt


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


#: loss-name aliases: the functor registry calls the mean-only robust loss
#: ``pseudo_huber_fn`` while the fast paths use the short name
_LOSS_ALIASES = {"pseudo_huber": "huber"}


def fast_objective_supports(muygps, loss: str = "lool") -> bool:
    """True iff :func:`make_fast_loo_objective` covers this model class —
    the device trainer uses this to choose between the fast assembly and
    the generic composed objective (same trainer either way)."""
    loss = _LOSS_ALIASES.get(loss, loss)
    kernel = muygps.kernel
    return (
        isinstance(kernel, (Matern, RBF))
        and isinstance(kernel.deformation, (Isotropy, Anisotropy))
        and isinstance(
            muygps.noise, (HomoscedasticNoise, HeteroscedasticNoise)
        )
        and loss in ("lool", "mse", "looph", "huber")
    )


def make_fast_loo_objective(
    muygps,
    batch_targets,
    batch_nn_targets,
    crosswise_dists,
    pairwise_dists,
    loss: str = "lool",
    layout: str = "lanes",
    boundary_scale: float = None,
    batch_features=None,
) -> Tuple[Callable, list]:
    """Build ``obj_fn(params_dict) -> -loss`` in lane layout.

    Args:
        muygps: a MuyGPS with Matern/RBF, Isotropy/Anisotropy,
            Homoscedastic/Heteroscedastic noise.
        batch_targets: ``(B, r)`` or ``(B,)``.
        batch_nn_targets: ``(B, n, r)`` or ``(B, n)``.
        crosswise_dists / pairwise_dists: the tensors produced by
            ``make_train_tensors`` for the model's deformation — distances
            ``(B, n)`` / ``(B, n, n)`` for Isotropy, per-feature differences
            ``(B, n, d)`` / ``(B, n, n, d)`` for Anisotropy.
        batch_features: ``(B, f)`` batch coordinates — required when the
            deformation's length scale is a hierarchical (nonstationary)
            parameter (reference ``experimental/hierarchical.py:110-124``);
            the per-batch ls field is re-solved from the knot values at
            every objective evaluation, under jit+grad.
        layout: ``"lanes"`` (default) assembles in the batch-on-lanes
            ``(n, n, B)`` layout with the unrolled
            :mod:`~muygpys_tpu.ops.lanes_solver` — fastest per evaluation,
            but its jaxpr grows with ``n``, so it belongs in a host-driven
            loop that compiles it ONCE.  ``"batched"`` keeps ``(B, n, n)``
            and uses the single-HLO ``jnp.linalg.cholesky`` /
            ``solve_triangular`` ops — an O(1)-size jaxpr safe to inline
            several times inside a ``lax.while_loop`` line search
            (:mod:`~muygpys_tpu.optimize.device_chassis`).

    Returns:
        (obj_fn, free_param_names); obj_fn takes a dict of free parameters
        (a JAX pytree — jit/grad-ready) and returns the negated loss,
        maximization-convention like the generic objective.
    """
    if layout not in ("lanes", "batched"):
        raise ValueError(f"unknown layout {layout!r}")
    loss = _LOSS_ALIASES.get(loss, loss)
    kernel = muygps.kernel
    if not isinstance(kernel, (Matern, RBF)):
        raise ValueError(
            f"fast objective supports Matern/RBF kernels, not {type(kernel)}"
        )
    is_aniso = isinstance(kernel.deformation, Anisotropy)
    if not isinstance(kernel.deformation, (Isotropy, Anisotropy)):
        raise ValueError(
            "fast objective requires an Isotropy or Anisotropy deformation, "
            f"not {type(kernel.deformation)}"
        )
    is_hetero = isinstance(muygps.noise, HeteroscedasticNoise)
    if not isinstance(
        muygps.noise, (HomoscedasticNoise, HeteroscedasticNoise)
    ):
        raise ValueError(
            "fast objective requires homo- or heteroscedastic noise, not "
            f"{type(muygps.noise)}"
        )
    if loss not in ("lool", "mse", "looph", "huber"):
        raise ValueError(
            f"fast objective supports lool/mse/looph/huber, not {loss!r}"
        )
    if boundary_scale is None:
        # the reference's own per-loss defaults (optimize/loss.py)
        boundary_scale = 3.0 if loss == "looph" else 1.5

    from muygpys_tpu.gp.hyperparameter.experimental import (
        NamedHierarchicalParameter,
    )

    is_hier = not is_aniso and isinstance(
        kernel.deformation.length_scale, NamedHierarchicalParameter
    )
    if is_hier and batch_features is None:
        raise ValueError(
            "hierarchical (nonstationary) length scales need batch_features"
        )

    metric_name = kernel.deformation.metric.name
    is_rbf = isinstance(kernel, RBF)
    if is_rbf:
        nu_fixed, nu0 = True, math.inf
        kfn = lambda d, nu: _k.rbf_fn(d)  # noqa: E731
    else:
        nu_fixed = kernel.smoothness.fixed()
        nu0 = float(kernel.smoothness())
        kfn = _matern_eval(nu_fixed, nu0)

    names, x0, _ = muygps.get_opt_params()
    batched = layout == "batched"

    y = jnp.asarray(batch_nn_targets)
    if y.ndim == 2:
        y = y[:, :, None]
    t = jnp.asarray(batch_targets)
    if t.ndim == 1:
        t = t[:, None]
    if batched:
        y_bl = y  # (B, n, r)
        t_bl = t  # (B, r)
    else:
        y_bl = jnp.transpose(y, (1, 2, 0))  # (n, r, B)
        t_bl = jnp.transpose(t, (1, 0))  # (r, B)

    # one-time layout change: batch to the lane axis (lanes layout only)
    if is_aniso:
        d_feat = len(kernel.deformation.length_scale)
        pw_a = jnp.asarray(pairwise_dists)
        cw_a = jnp.asarray(crosswise_dists)
        if pw_a.ndim != 4 or pw_a.shape[-1] != d_feat:
            raise ValueError(
                "anisotropic fast objective expects per-feature difference "
                f"tensors (B, n, n, {d_feat}); got {pw_a.shape}"
            )
        ls_params = kernel.deformation.length_scale  # NamedVectorParameter
        ls0 = [float(p()) for p in ls_params]
        ls_names = [p.name() for p in ls_params]
        if batched:
            pw_bl = pw_a  # (B, n, n, d)
            cw_bl = cw_a  # (B, n, d)
            B, n = pw_bl.shape[0], pw_bl.shape[1]
        else:
            pw_bl = jnp.transpose(pw_a, (1, 2, 3, 0))  # (n, n, d, B)
            cw_bl = jnp.transpose(cw_a, (1, 2, 0))  # (n, d, B)
            n, _, _, B = pw_bl.shape

        def scaled_dists(params):
            ls_vec = jnp.stack(
                [
                    jnp.asarray(params.get(ls_names[i], ls0[i]))
                    for i in range(d_feat)
                ]
            )
            if batched:
                u_p = jnp.sum((pw_bl / ls_vec) ** 2, axis=3)
                u_c = jnp.sum((cw_bl / ls_vec) ** 2, axis=2)
            else:
                u_p = jnp.sum(
                    (pw_bl / ls_vec[None, None, :, None]) ** 2, axis=2
                )
                u_c = jnp.sum((cw_bl / ls_vec[None, :, None]) ** 2, axis=1)
            if metric_name == "l2":
                return safe_sqrt(u_p), safe_sqrt(u_c)
            return u_p, u_c

    elif is_hier:
        hier = kernel.deformation.length_scale
        hname = hier.name()
        bf = jnp.asarray(batch_features)
        if batched:
            pw_bl = jnp.asarray(pairwise_dists)  # (B, n, n)
            cw_bl = jnp.asarray(crosswise_dists)  # (B, n)
            B, n = pw_bl.shape[0], pw_bl.shape[1]
        else:
            pw_bl = jnp.transpose(jnp.asarray(pairwise_dists), (1, 2, 0))
            cw_bl = jnp.transpose(jnp.asarray(crosswise_dists), (1, 0))
            n, _, B = pw_bl.shape
        apply_ls = kernel.deformation.metric.apply_length_scale

        def scaled_dists(params):
            knots = {
                k: v for k, v in params.items() if k.startswith(hname)
            }
            ls_b = hier(bf, **knots)  # (B,) nonstationary field
            if batched:
                lp, lc = ls_b[:, None, None], ls_b[:, None]
            else:
                lp, lc = ls_b[None, None, :], ls_b[None, :]
            return apply_ls(pw_bl, lp), apply_ls(cw_bl, lc)

    else:
        if batched:
            pw_bl = jnp.asarray(pairwise_dists)  # (B, n, n)
            cw_bl = jnp.asarray(crosswise_dists)  # (B, n)
            B, n = pw_bl.shape[0], pw_bl.shape[1]
        else:
            pw_bl = jnp.transpose(jnp.asarray(pairwise_dists), (1, 2, 0))
            cw_bl = jnp.transpose(jnp.asarray(crosswise_dists), (1, 0))
            n, _, B = pw_bl.shape
        apply_ls = kernel.deformation.metric.apply_length_scale
        ls0_s = float(kernel.deformation.length_scale())

        def scaled_dists(params):
            ls = params.get("length_scale", ls0_s)
            return apply_ls(pw_bl, ls), apply_ls(cw_bl, ls)

    if batched:
        eye_bl = jnp.eye(n, dtype=pw_bl.dtype)[None]  # (1, n, n)
    else:
        eye_bl = jnp.eye(n, dtype=pw_bl.dtype)[:, :, None]
    if is_hetero:
        # (B, n) per-neighbor nugget -> per-lane diagonal add
        eps = jnp.asarray(muygps.noise())
        eps_bl = eps if batched else jnp.transpose(eps, (1, 0))
        noise0 = None
        noise_is_free = False
    else:
        noise0 = float(muygps.noise())
        noise_is_free = "noise" in names

    if batched:
        # single-HLO batched factorization: O(1)-size jaxpr, safe to inline
        # repeatedly inside lax.while_loop line searches
        chol = jnp.linalg.cholesky

        def tri_fwd(L, R):
            return jax.scipy.linalg.solve_triangular(L, R, lower=True)

    else:
        chol, tri_fwd = cholesky_bl, tri_solve_fwd_bl

    # reference semantics quirk mirrored exactly: inside the objective the
    # analytic sigma^2 perturbs Kin with the model's STORED noise, not the
    # proposed one (reference gp/hyperparameter/scale.py:205
    # ``muygps.noise.perturb(Kin)`` — no kwarg).  When noise is a free
    # parameter this costs a second factorization; otherwise the main factor
    # is reused.

    def obj_fn(params):
        nu = params.get("smoothness", nu0)
        u_p, u_c = scaled_dists(params)
        Kraw = kfn(u_p, nu)
        Kcross = kfn(u_c, nu)  # (n, B)
        if is_hetero:
            Kin = Kraw + eye_bl * eps_bl[:, None, :]
        else:
            Kin = Kraw + params.get("noise", noise0) * eye_bl

        L = chol(Kin)
        if batched:
            rhs = jnp.concatenate([Kcross[:, :, None], y_bl], axis=2)
            Z = tri_fwd(L, rhs)  # (B, n, 1+r) = L^{-1}[Kc, Y]
            zc = Z[:, :, 0]  # L^{-1} Kcross
            zy = Z[:, :, 1:]  # L^{-1} Y
            mean = jnp.einsum("bn,bnr->br", zc, zy)  # Kc^T Kin^{-1} Y
            var = 1.0 - jnp.einsum("bn,bn->b", zc, zc)
        else:
            rhs = jnp.concatenate([Kcross[:, None, :], y_bl], axis=1)
            Z = tri_fwd(L, rhs)  # (n, 1+r, B) = L^{-1}[Kc, Y]
            zc = Z[:, 0, :]  # L^{-1} Kcross
            zy = Z[:, 1:, :]  # L^{-1} Y
            mean = jnp.einsum("nb,nrb->rb", zc, zy)  # Kc^T Kin^{-1} Y
            var = 1.0 - jnp.einsum("nb,nb->b", zc, zc)
        if loss == "mse":
            return -jnp.sum((mean - t_bl) ** 2) / t_bl.size
        if loss == "huber":
            # unnormalized pseudo-Huber on the posterior mean
            # (ops.loss.pseudo_huber_fn semantics)
            bs2 = boundary_scale**2
            return -bs2 * jnp.sum(
                jnp.sqrt(1.0 + (mean - t_bl) ** 2 / bs2) - 1.0
            )
        if noise_is_free:
            L0 = chol(Kraw + noise0 * eye_bl)
            zy0 = tri_fwd(L0, y_bl)
        else:
            zy0 = zy
        scale = jnp.sum(zy0 * zy0) / (B * n)  # analytic sigma^2
        # f32 floor: near-singular neighborhoods round var slightly negative
        # and log() would NaN the objective (see ops/loss._floor_variances)
        sv = jnp.maximum(
            scale * var, 10.0 * jnp.finfo(var.dtype).eps
        )  # (B,)
        sv_b = sv[:, None] if batched else sv[None, :]
        sq = (mean - t_bl) ** 2
        if loss == "looph":
            # leave-one-out pseudo-Huber (Eq. 8 of arXiv:2409.11577),
            # identical to ops.loss.looph_fn on the same statistics
            bs2 = boundary_scale**2
            return -jnp.sum(
                2.0 * bs2 * (jnp.sqrt(1.0 + sq / (bs2 * sv_b)) - 1.0)
                + jnp.log(sv_b)
            )
        return -jnp.sum(sq / sv_b + jnp.log(sv_b))

    return obj_fn, names
