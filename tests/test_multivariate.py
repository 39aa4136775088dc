"""MultivariateMuyGPS tests (mirror of reference tests/multivariate.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu._test import oracle
from muygpys_tpu.gp import MultivariateMuyGPS, MuyGPS
from muygpys_tpu.gp.deformation import Anisotropy, Isotropy, l2
from muygpys_tpu.gp.hyperparameter import (
    AnalyticScale,
    Parameter,
    VectorParameter,
)
from muygpys_tpu.gp.kernels import Matern
from muygpys_tpu.gp.noise import HomoscedasticNoise


def _args(nu, ls, noise=1e-4):
    return {
        "kernel": Matern(
            smoothness=Parameter(nu),
            deformation=Isotropy(l2, length_scale=Parameter(ls)),
        ),
        "noise": HomoscedasticNoise(noise),
        "scale": AnalyticScale(),
    }


@pytest.fixture(scope="module")
def problem(rng):
    train = rng.uniform(size=(150, 3))
    test = rng.uniform(size=(40, 3))
    y = rng.standard_normal((150, 2))
    nn = np.argsort(
        np.linalg.norm(test[:, None] - train[None], axis=-1), axis=1
    )[:, :12]
    return train, test, y, nn


def test_deprecation_warning():
    with pytest.warns(DeprecationWarning):
        MultivariateMuyGPS(_args(0.5, 1.0))


def test_matches_independent_models(problem):
    train, test, y, nn = problem
    with pytest.warns(DeprecationWarning):
        mmuygps = MultivariateMuyGPS(_args(0.5, 0.7), _args(1.5, 0.3))
    crosswise, pairwise, nn_targets = mmuygps.make_predict_tensors(
        np.arange(test.shape[0]), nn, jnp.asarray(test), jnp.asarray(train),
        jnp.asarray(y),
    )
    mean = np.array(mmuygps.posterior_mean(pairwise, crosswise, nn_targets))
    var = np.array(mmuygps.posterior_variance(pairwise, crosswise))
    assert mean.shape == (40, 2)
    assert var.shape == (40, 2)

    for i, args in enumerate([_args(0.5, 0.7), _args(1.5, 0.3)]):
        model = MuyGPS(**args)
        Kin = model.kernel(pairwise)
        Kcross = model.kernel(crosswise)
        mean_i = np.array(
            model.posterior_mean(Kin, Kcross, nn_targets[:, :, i : i + 1])
        ).reshape(-1)
        var_i = np.array(model.posterior_variance(Kin, Kcross)).reshape(-1)
        np.testing.assert_allclose(mean[:, i], mean_i, rtol=1e-10)
        np.testing.assert_allclose(var[:, i], var_i, rtol=1e-10)


def test_fast_path(problem):
    train, test, y, _ = problem
    with pytest.warns(DeprecationWarning):
        mmuygps = MultivariateMuyGPS(_args(1.5, 0.4), _args(2.5, 0.4))
    from muygpys_tpu.neighbors import NN_Wrapper
    from muygpys_tpu.examples.fast_posterior_mean import (
        fast_posterior_mean_any,
    )

    nbrs = NN_Wrapper(train, 12, nn_method="exact")
    mean, coeffs, timing = fast_posterior_mean_any(
        mmuygps, test, train, nbrs, y
    )
    assert mean.shape == (40, 2)
    assert coeffs.shape == (150, 12, 2)
    assert np.all(np.isfinite(mean))


def test_optimize_scale(problem):
    train, _, y, _ = problem
    with pytest.warns(DeprecationWarning):
        mmuygps = MultivariateMuyGPS(_args(1.5, 0.4), _args(2.5, 0.4))
    nn = np.argsort(
        np.linalg.norm(train[:, None] - train[None], axis=-1), axis=1
    )[:, 1:13]
    _, pairwise, _, nn_targets = mmuygps.make_train_tensors(
        np.arange(150), nn, jnp.asarray(train), jnp.asarray(y)
    )
    mmuygps.optimize_scale(pairwise, nn_targets)
    for model in mmuygps.models:
        assert model.scale.trained
        assert float(model.scale()) > 0
