"""Posterior solver conformance tests — numpy LAPACK oracles.

The Cholesky-based fused solvers must match the straightforward
``np.linalg.solve`` formulas (the reference numpy backend's semantics,
_src/gp/muygps/numpy.py) to tight tolerance in f64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muygpys_tpu._test import oracle
from muygpys_tpu.ops import noise as noise_ops
from muygpys_tpu.ops import scale as scale_ops
from muygpys_tpu.ops import solve


@pytest.fixture(scope="module")
def spd_problem(rng):
    b, n, r = 20, 12, 3
    A = rng.normal(size=(b, n, n))
    Kin = A @ np.swapaxes(A, -2, -1) / n + 2.0 * np.eye(n)
    Kcross = rng.uniform(0.1, 1.0, size=(b, n))
    y = rng.normal(size=(b, n, r))
    return Kin, Kcross, y


class TestSolvers:
    def test_posterior_mean(self, spd_problem):
        Kin, Kcross, y = spd_problem
        got = solve.posterior_mean(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(y)
        )
        want = oracle.posterior_mean(Kin, Kcross, y)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_posterior_mean_univariate_2d_targets(self, spd_problem):
        Kin, Kcross, y = spd_problem
        got = solve.posterior_mean(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(y[:, :, 0])
        )
        want = oracle.posterior_mean(Kin, Kcross, y[:, :, 0:1])[:, 0]
        assert got.shape == (Kin.shape[0],)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_diagonal_variance(self, spd_problem):
        Kin, Kcross, _ = spd_problem
        got = solve.diagonal_variance(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(1.0)
        )
        want = oracle.diagonal_variance(Kin, Kcross)
        assert got.shape == (Kin.shape[0],)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_fused_mean_variance_scale(self, spd_problem):
        Kin, Kcross, y = spd_problem
        mean, var, scale = solve.posterior_mean_variance_scale(
            jnp.asarray(Kin),
            jnp.asarray(Kcross),
            jnp.asarray(1.0),
            jnp.asarray(y),
        )
        np.testing.assert_allclose(
            mean, oracle.posterior_mean(Kin, Kcross, y), rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            var, oracle.diagonal_variance(Kin, Kcross), rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            scale, oracle.analytic_scale(Kin, y), rtol=1e-9
        )

    def test_fast_precompute_and_mean(self, spd_problem, rng):
        Kin, Kcross, y = spd_problem
        coeffs = solve.fast_posterior_mean_precompute(
            jnp.asarray(Kin), jnp.asarray(y[:, :, 0])
        )
        want = np.linalg.solve(Kin, y[:, :, 0:1])[:, :, 0]
        np.testing.assert_allclose(coeffs, want, rtol=1e-9, atol=1e-11)
        pred = solve.fast_posterior_mean(jnp.asarray(Kcross), coeffs)
        np.testing.assert_allclose(
            pred, np.einsum("ij,ij->i", Kcross, want), rtol=1e-9, atol=1e-11
        )

    def test_multivariate_flattened_layout(self, rng):
        """Flattened (b, i, n, i, n) layout as used by shear kernels."""
        b, i, n = 6, 3, 5
        A = rng.normal(size=(b, i * n, i * n))
        Kin_flat = A @ np.swapaxes(A, -2, -1) / (i * n) + 2.0 * np.eye(i * n)
        Kin = Kin_flat.reshape(b, i, n, i, n)
        Kcross = rng.uniform(0.1, 1.0, size=(b, i, n, 3))
        y = rng.normal(size=(b, i, n))
        got = solve.posterior_mean(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(y)
        )
        F = np.linalg.solve(Kin_flat, Kcross.reshape(b, i * n, 3))
        want = np.einsum("bnk,bn->bk", F, y.reshape(b, i * n))
        assert got.shape == (b, 3)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_grad_through_solve(self, spd_problem):
        Kin, Kcross, y = spd_problem

        def f(s):
            return jnp.sum(
                solve.posterior_mean(
                    jnp.asarray(Kin) * s, jnp.asarray(Kcross), jnp.asarray(y)
                )
            )

        g = jax.grad(f)(1.0)
        fd = (f(1.0 + 1e-6) - f(1.0 - 1e-6)) / 2e-6
        np.testing.assert_allclose(g, fd, rtol=1e-5)


class TestNoise:
    def test_homoscedastic_3d(self, spd_problem):
        Kin, _, _ = spd_problem
        got = noise_ops.homoscedastic_perturb(jnp.asarray(Kin), 0.37)
        np.testing.assert_allclose(
            got, Kin + 0.37 * np.eye(Kin.shape[-1]), atol=1e-12
        )

    def test_homoscedastic_5d(self, rng):
        Kin = rng.normal(size=(4, 3, 5, 3, 5))
        got = noise_ops.homoscedastic_perturb(jnp.asarray(Kin), 0.5)
        want = Kin.reshape(4, 15, 15) + 0.5 * np.eye(15)
        np.testing.assert_allclose(
            got, want.reshape(4, 3, 5, 3, 5), atol=1e-12
        )

    def test_heteroscedastic(self, spd_problem, rng):
        Kin, _, _ = spd_problem
        nv = rng.uniform(size=Kin.shape[:2])
        got = noise_ops.heteroscedastic_perturb(jnp.asarray(Kin), jnp.asarray(nv))
        want = Kin.copy()
        for i in range(Kin.shape[0]):
            want[i] += np.diag(nv[i])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_shear33(self, rng):
        n = 4
        Kin = rng.normal(size=(2, 3, n, 3, n))
        got = noise_ops.shear_perturb33(jnp.asarray(Kin), 0.25)
        diag = np.concatenate(
            [0.5 * np.ones(n), 0.25 * np.ones(2 * n)]
        )
        want = Kin.reshape(2, 3 * n, 3 * n) + np.diag(diag)
        np.testing.assert_allclose(
            got, want.reshape(2, 3, n, 3, n), atol=1e-12
        )


class TestScale:
    def test_analytic_scale(self, spd_problem):
        Kin, _, y = spd_problem
        got = scale_ops.analytic_scale_optim(jnp.asarray(Kin), jnp.asarray(y))
        np.testing.assert_allclose(
            got, oracle.analytic_scale(Kin, y), rtol=1e-9
        )

    def test_analytic_scale_univariate(self, spd_problem):
        Kin, _, y = spd_problem
        got = scale_ops.analytic_scale_optim(
            jnp.asarray(Kin), jnp.asarray(y[:, :, 0])
        )
        np.testing.assert_allclose(
            got, oracle.analytic_scale(Kin, y[:, :, 0:1]), rtol=1e-9
        )


class TestServePath:
    def test_serve_matches_separate(self, spd_problem):
        Kin, Kcross, y = spd_problem
        mean, var = solve.serve_mean_and_variance(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(1.0),
            jnp.asarray(y),
        )
        np.testing.assert_allclose(
            mean, oracle.posterior_mean(Kin, Kcross, y), rtol=1e-9,
            atol=1e-11,
        )
        np.testing.assert_allclose(
            var, oracle.diagonal_variance(Kin, Kcross), rtol=1e-9,
            atol=1e-11,
        )

    def test_serve_univariate_2d(self, spd_problem):
        Kin, Kcross, y = spd_problem
        mean, var = solve.serve_mean_and_variance(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(1.0),
            jnp.asarray(y[:, :, 0]),
        )
        assert mean.shape == (Kin.shape[0],)
        np.testing.assert_allclose(
            mean, oracle.posterior_mean(Kin, Kcross, y[:, :, 0:1])[:, 0],
            rtol=1e-9, atol=1e-11,
        )


class TestLanesSolver:
    """Batch-last layout solver (ops/lanes_solver.py) vs the numpy oracle."""

    def test_solve_bl_matches_oracle(self, spd_problem):
        from muygpys_tpu.ops import lanes_solver as ls

        Kin, Kcross, y = spd_problem
        K_bl = jnp.asarray(np.transpose(Kin, (1, 2, 0)))
        R = np.concatenate([Kcross[:, :, None], y], axis=-1)
        R_bl = jnp.asarray(np.transpose(R, (1, 2, 0)))
        sol = np.transpose(np.asarray(ls.solve_bl(K_bl, R_bl)), (2, 0, 1))
        want = np.linalg.solve(Kin, R)
        np.testing.assert_allclose(sol, want, rtol=1e-9, atol=1e-11)

    def test_cholesky_bl(self, spd_problem):
        from muygpys_tpu.ops import lanes_solver as ls

        Kin, _, _ = spd_problem
        L = np.transpose(
            np.asarray(ls.cholesky_bl(jnp.asarray(np.transpose(Kin, (1, 2, 0))))),
            (2, 0, 1),
        )
        np.testing.assert_allclose(
            L, np.linalg.cholesky(Kin), rtol=1e-9, atol=1e-11
        )

    def test_serve_bl_matches_standard(self, spd_problem):
        from muygpys_tpu.ops import lanes_solver as ls

        Kin, Kcross, y = spd_problem
        mean_std, var_std = solve.serve_mean_and_variance(
            jnp.asarray(Kin), jnp.asarray(Kcross), jnp.asarray(1.0),
            jnp.asarray(y),
        )
        mean_bl, var_bl = ls.serve_mean_and_variance_bl(
            jnp.asarray(np.transpose(Kin, (1, 2, 0))),
            jnp.asarray(Kcross.T),
            jnp.asarray(1.0),
            jnp.asarray(np.transpose(y, (1, 2, 0))),
        )
        np.testing.assert_allclose(
            np.asarray(mean_bl).T, mean_std, rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(var_bl, var_std, rtol=1e-9, atol=1e-11)
