"""MuyGPS model frontend tests.

Two layers of checking, mirroring the reference's tests/gp.py and
_test/gp.py:
1. conformance: the composed frontend (kernel -> noise -> solve -> scale)
   matches the numpy oracle formula chain exactly;
2. statistics: with all neighbors (nn = train_count), MuyGPS posteriors are
   identical to a dense-GP conditional, and with fewer neighbors they
   approximate it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu._test import oracle
from muygpys_tpu.gp import MuyGPS
from muygpys_tpu.gp.deformation import Isotropy, l2
from muygpys_tpu.gp.hyperparameter import AnalyticScale, Parameter
from muygpys_tpu.gp.kernels import Matern
from muygpys_tpu.gp.noise import HomoscedasticNoise


@pytest.fixture(scope="module")
def problem(rng):
    train_count, test_count, f = 200, 30, 2
    train = rng.uniform(size=(train_count, f))
    test = rng.uniform(size=(test_count, f))
    y = oracle.dense_gp_sample(rng, train, nu=1.5, length_scale=0.3,
                               noise=1e-6, n_draws=1)
    return train, test, y


def _make_model(nu=1.5, ls=0.3, noise=1e-5, scale=None):
    return MuyGPS(
        kernel=Matern(
            smoothness=Parameter(nu),
            deformation=Isotropy(l2, length_scale=Parameter(ls)),
        ),
        noise=HomoscedasticNoise(noise),
        scale=scale,
    )


def _knn(train, queries, nn_count):
    d = np.linalg.norm(queries[:, None, :] - train[None, :, :], axis=-1)
    return np.argsort(d, axis=1)[:, :nn_count]


class TestConformance:
    def test_posterior_matches_oracle_chain(self, problem):
        train, test, y = problem
        nn_count = 20
        nn_indices = _knn(train, test, nn_count)
        indices = np.arange(test.shape[0])
        model = _make_model()
        crosswise, pairwise, nn_targets = model.make_predict_tensors(
            indices, nn_indices, jnp.asarray(test), jnp.asarray(train),
            jnp.asarray(y),
        )
        Kcross = model.kernel(crosswise)
        Kin = model.kernel(pairwise)
        mean = model.posterior_mean(Kin, Kcross, nn_targets)
        var = model.posterior_variance(Kin, Kcross)

        # oracle chain in numpy
        d_cross = oracle.crosswise_l2(test, train, indices, nn_indices)
        d_pair = oracle.pairwise_l2(train, nn_indices)
        Kc_o = oracle.matern(d_cross / 0.3, 1.5)
        Ki_o = oracle.matern(d_pair / 0.3, 1.5) + 1e-5 * np.eye(nn_count)
        mean_o = oracle.posterior_mean(Ki_o, Kc_o, y[nn_indices])
        var_o = oracle.diagonal_variance(Ki_o, Kc_o)
        np.testing.assert_allclose(mean, mean_o, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(var, var_o, rtol=1e-7, atol=1e-9)

    def test_fast_mean_approximates_full(self, problem):
        train, test, y = problem
        nn_count = 30
        train_nn = _knn(train, train, nn_count + 1)[:, 1:]  # drop self
        from muygpys_tpu.ops.tensors import fast_nn_update
        model = _make_model()
        nn_fast = fast_nn_update(jnp.asarray(train_nn))
        pairwise_fast = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(train), nn_fast
        )
        Kin_fast = model.kernel(pairwise_fast)
        coeffs = model.fast_coefficients(Kin_fast, jnp.asarray(y)[nn_fast])

        test_nn = _knn(train, test, nn_count)
        closest = np.array(nn_fast)[test_nn[:, 0]]
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(test), jnp.asarray(train),
            np.arange(test.shape[0]), closest,
        )
        Kcross = model.kernel(crosswise)
        fast_pred = model.fast_posterior_mean(
            Kcross, jnp.asarray(coeffs)[test_nn[:, 0]]
        )

        # full posterior mean for comparison
        crosswise_f, pairwise_f, nn_targets = model.make_predict_tensors(
            np.arange(test.shape[0]), test_nn, jnp.asarray(test),
            jnp.asarray(train), jnp.asarray(y),
        )
        full = model.posterior_mean(
            model.kernel(pairwise_f), model.kernel(crosswise_f), nn_targets
        )
        corr = np.corrcoef(np.array(fast_pred), np.array(full)[:, 0])[0, 1]
        assert corr > 0.99

    def test_optimize_scale(self, problem):
        train, _, y = problem
        nn_count = 20
        batch_nn = _knn(train, train, nn_count + 1)[:, 1:]
        indices = np.arange(50)
        model = _make_model(scale=AnalyticScale())
        _, pairwise, _, nn_targets = model.make_train_tensors(
            indices, batch_nn[:50], jnp.asarray(train), jnp.asarray(y)
        )
        model.optimize_scale(pairwise, nn_targets)
        assert model.scale.trained
        Kin_o = np.array(model.kernel(pairwise)) + 1e-5 * np.eye(nn_count)
        want = oracle.analytic_scale(Kin_o, np.array(nn_targets))
        np.testing.assert_allclose(float(model.scale()), want, rtol=1e-7)


class TestStatistics:
    def test_full_neighborhood_equals_dense_gp(self, rng):
        """With nn = train_count, MuyGPS == exact GP conditional."""
        train_count, test_count = 40, 8
        train = rng.uniform(size=(train_count, 1))
        test = rng.uniform(size=(test_count, 1))
        y = oracle.dense_gp_sample(rng, train, 2.5, 0.4, 1e-6)
        noise = 1e-4

        model = _make_model(nu=2.5, ls=0.4, noise=noise)
        nn_indices = np.tile(np.arange(train_count), (test_count, 1))
        crosswise, pairwise, nn_targets = model.make_predict_tensors(
            np.arange(test_count), nn_indices, jnp.asarray(test),
            jnp.asarray(train), jnp.asarray(y),
        )
        mean = model.posterior_mean(
            model.kernel(pairwise), model.kernel(crosswise), nn_targets
        )
        var = model.posterior_variance(
            model.kernel(pairwise), model.kernel(crosswise)
        )

        # dense GP conditional
        dtr = np.linalg.norm(train[:, None] - train[None, :], axis=-1)
        dte = np.linalg.norm(test[:, None] - train[None, :], axis=-1)
        Ktr = oracle.matern(dtr / 0.4, 2.5) + noise * np.eye(train_count)
        Kte = oracle.matern(dte / 0.4, 2.5)
        mean_dense = Kte @ np.linalg.solve(Ktr, y)
        var_dense = 1.0 - np.einsum(
            "ij,ij->i", Kte, np.linalg.solve(Ktr, Kte.T).T
        )
        np.testing.assert_allclose(mean, mean_dense, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(var, var_dense, rtol=1e-6, atol=1e-8)

    def test_sparse_neighborhood_approximates_dense(self, problem):
        train, test, y = problem
        model = _make_model(noise=1e-5)
        nn_indices = _knn(train, test, 50)
        crosswise, pairwise, nn_targets = model.make_predict_tensors(
            np.arange(test.shape[0]), nn_indices, jnp.asarray(test),
            jnp.asarray(train), jnp.asarray(y),
        )
        mean = np.array(
            model.posterior_mean(
                model.kernel(pairwise), model.kernel(crosswise), nn_targets
            )
        )
        dtr = np.linalg.norm(train[:, None] - train[None, :], axis=-1)
        dte = np.linalg.norm(test[:, None] - train[None, :], axis=-1)
        Ktr = oracle.matern(dtr / 0.3, 1.5) + 1e-5 * np.eye(train.shape[0])
        Kte = oracle.matern(dte / 0.3, 1.5)
        mean_dense = Kte @ np.linalg.solve(Ktr, y)
        rmse = np.sqrt(np.mean((mean - mean_dense) ** 2))
        scale = np.sqrt(np.mean(mean_dense**2))
        assert rmse < 0.1 * scale
