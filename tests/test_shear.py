"""Shear kernel tests against pointwise analytic closed forms.

Mirrors the reference's strategy (tests/experimental/shear.py +
_test/shear.py:17-135): check block tensors against analytic second
derivatives of the RBF, and full MuyGPS posteriors against a dense
conventional-GP solve with the same covariance.
"""

import jax
import numpy as np
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
from muygpys_tpu.ops.shear import shear_33_fn


# analytic closed forms: second derivatives of exp(-(dx^2+dy^2)/(2b))
def _ingr(x1, y1, x2, y2, b):
    dx, dy = x1 - x2, y1 - y2
    e = np.exp(-(dx**2 + dy**2) / (2 * b))
    return dx, dy, e


def kk_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return 0.25 * (
        (8 * b**2 - 8 * b * (dx**2 + dy**2) + dx**4
         + 2 * dx**2 * dy**2 + dy**4) * e / b**4
    )


def kg1_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return 0.25 * ((6 * b * (dy**2 - dx**2) + dx**4 - dy**4) * e / b**4)


def kg2_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return 0.5 * dx * dy * (-6 * b + dx**2 + dy**2) * e / b**4


def g1g1_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return 0.25 * (
        (4 * b**2 - 4 * b * (dx**2 + dy**2) + dx**4
         - 2 * dx**2 * dy**2 + dy**4) * e / b**4
    )


def g1g2_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return 0.5 * dx * dy * (dx**2 - dy**2) * e / b**4


def g2g2_f(x1, y1, x2, y2, b=1.0):
    dx, dy, e = _ingr(x1, y1, x2, y2, b)
    return (b**2 - b * (dx**2 + dy**2) + dx**2 * dy**2) * e / b**4


_BLOCKS = [
    [kk_f, kg1_f, kg2_f],
    [kg1_f, g1g1_f, g1g2_f],
    [kg2_f, g1g2_f, g2g2_f],
]


def _dense_shear_cov(X1, X2, ls):
    """(3 n1, 3 n2) conventional dense covariance from pointwise forms."""
    n1, n2 = X1.shape[0], X2.shape[0]
    out = np.zeros((3 * n1, 3 * n2))
    for a in range(3):
        for b in range(3):
            for i in range(n1):
                for j in range(n2):
                    out[a * n1 + i, b * n2 + j] = _BLOCKS[a][b](
                        X1[i, 0], X1[i, 1], X2[j, 0], X2[j, 1], ls
                    )
    return out


@pytest.fixture(scope="module")
def grid():
    n = 5
    g = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    return np.stack([g[0].ravel(), g[1].ravel()], axis=1)


class TestBlocks:
    def test_shear33_matches_pointwise(self, rng):
        pts = rng.uniform(size=(7, 2))
        diffs = pts[:, None, :] - pts[None, :, :]
        got = np.array(shear_33_fn(jnp.asarray(diffs[None]), 0.3))
        for a in range(3):
            for b in range(3):
                for i in range(7):
                    for j in range(7):
                        want = _BLOCKS[a][b](
                            pts[i, 0], pts[i, 1], pts[j, 0], pts[j, 1], 0.3
                        )
                        np.testing.assert_allclose(
                            got[a, i, b, j], want, rtol=1e-10, atol=1e-12
                        )

    def test_kout_at_zero(self):
        kern = ShearKernel(
            deformation=DifferenceIsotropy(F2, length_scale=Parameter(0.3))
        )
        Kout = np.array(kern.Kout())
        ls = 0.3
        want = np.diag(
            [kk_f(0, 0, 0, 0, ls), g1g1_f(0, 0, 0, 0, ls),
             g2g2_f(0, 0, 0, 0, ls)]
        )
        np.testing.assert_allclose(Kout, want, atol=1e-12)

    def test_23_blocks_are_submatrices_of_33(self, rng):
        pts = rng.uniform(size=(6, 2))
        diffs = (pts[:, None, :] - pts[None, :, :])[None]
        kern23 = ShearKernel2in3out(
            deformation=DifferenceIsotropy(F2, length_scale=Parameter(0.4))
        )
        K33 = np.array(shear_33_fn(jnp.asarray(diffs), 0.4))
        Kin23 = np.array(kern23(jnp.asarray(diffs)))
        Kcross23 = np.array(
            kern23(jnp.asarray(diffs), force_Kcross=True)
        )
        # Kin23 = shear blocks (1:,1:) of K33
        np.testing.assert_allclose(
            Kin23, K33[1:, :, 1:, :], rtol=1e-12
        )
        # Kcross23 = rows (gamma1, gamma2) x all three outputs
        np.testing.assert_allclose(
            Kcross23, K33[1:, :, :, :], rtol=1e-12
        )


class TestPosterior:
    def test_full_neighborhood_matches_conventional(self, grid, rng):
        """MuyGPS with all-points neighborhoods + ShearNoise33 must equal the
        dense conventional GP solve."""
        ls, noise = 0.1, 1e-4
        n = grid.shape[0]
        test = rng.uniform(0.05, 0.95, size=(4, 2))

        # sample targets from the dense prior
        Kdense = _dense_shear_cov(grid, grid, ls)
        L = np.linalg.cholesky(Kdense + 1e-8 * np.eye(3 * n))
        flat = L @ rng.standard_normal(3 * n)
        targets = flat.reshape(3, n).T  # (n, 3)

        model = MuyGPS(
            kernel=ShearKernel(
                deformation=DifferenceIsotropy(
                    F2, length_scale=Parameter(ls)
                )
            ),
            noise=ShearNoise33(noise),
            scale=FixedScale(),
        )
        nn_indices = np.tile(np.arange(n), (test.shape[0], 1))
        pairwise = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(grid), nn_indices
        )
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(test), jnp.asarray(grid),
            np.arange(test.shape[0]), nn_indices,
        )
        Kin = model.kernel(pairwise)
        Kcross = model.kernel(crosswise)
        nn_targets = jnp.asarray(targets[nn_indices].swapaxes(-2, -1))
        mean = np.array(model.posterior_mean(Kin, Kcross, nn_targets))
        var = np.array(model.posterior_variance(Kin, Kcross))

        # conventional dense solve with the shear nugget
        nugget = np.diag(
            np.concatenate([2 * noise * np.ones(n), noise * np.ones(2 * n)])
        )
        Kc = _dense_shear_cov(test, grid, ls)
        sol = np.linalg.solve(Kdense + nugget, flat)
        mean_dense = (Kc @ sol).reshape(3, test.shape[0]).T
        np.testing.assert_allclose(mean, mean_dense, rtol=1e-6, atol=1e-8)

        Kout_dense = _dense_shear_cov(
            np.zeros((1, 2)), np.zeros((1, 2)), ls
        )
        var_dense = np.stack(
            [
                np.diag(Kout_dense)
                - np.diag(
                    Kc[i :: test.shape[0]]
                    @ np.linalg.solve(
                        Kdense + nugget, Kc[i :: test.shape[0]].T
                    )
                )
                for i in range(test.shape[0])
            ]
        )
        # var shape (test_count, 3, 3); compare diagonals
        got_diag = np.stack([np.diag(v) for v in var])
        np.testing.assert_allclose(got_diag, var_dense, rtol=1e-6, atol=1e-8)

    def test_23_posterior_shapes(self, grid, rng):
        ls, noise = 0.1, 1e-4
        n = grid.shape[0]
        test = rng.uniform(0.05, 0.95, size=(4, 2))
        targets = rng.standard_normal((n, 2))
        model = MuyGPS(
            kernel=ShearKernel2in3out(
                deformation=DifferenceIsotropy(
                    F2, length_scale=Parameter(ls)
                )
            ),
            noise=HomoscedasticNoise(noise),
            scale=FixedScale(),
        )
        nn = 10
        d = np.linalg.norm(test[:, None] - grid[None], axis=-1)
        nn_indices = np.argsort(d, axis=1)[:, :nn]
        pairwise = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(grid), nn_indices
        )
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(test), jnp.asarray(grid),
            np.arange(4), nn_indices,
        )
        Kin = model.kernel(pairwise)
        Kcross = model.kernel(crosswise)
        assert Kin.shape == (4, 2, nn, 2, nn)
        assert Kcross.shape == (4, 2, nn, 3)
        nn_targets = jnp.asarray(targets[nn_indices].swapaxes(-2, -1))
        mean = model.posterior_mean(Kin, Kcross, nn_targets)
        var = model.posterior_variance(Kin, Kcross)
        assert mean.shape == (4, 3)
        assert var.shape == (4, 3, 3)
        assert np.all(np.isfinite(mean))
        assert np.all(np.isfinite(np.array(var)))


class TestShearOptimization:
    def test_length_scale_recovery(self, grid, rng):
        """LOO optimization of the shear kernel's length scale via the
        standard chassis (mirror of reference tests/experimental/shear.py
        optimization cases)."""
        from muygpys_tpu.optimize import L_BFGS_B_optimize, mse_fn

        ls_true, noise = 0.10, 1e-5
        n = grid.shape[0]
        Kdense = _dense_shear_cov(grid, grid, ls_true)
        L = np.linalg.cholesky(Kdense + 1e-8 * np.eye(3 * n))
        flat = L @ rng.standard_normal(3 * n)
        targets = flat.reshape(3, n).T  # (n, 3)

        model = MuyGPS(
            kernel=ShearKernel(
                deformation=DifferenceIsotropy(
                    F2, length_scale=Parameter(0.15, (0.02, 0.3))
                )
            ),
            noise=ShearNoise33(noise),
            scale=FixedScale(),
        )
        nn = 12
        batch = n
        d = np.linalg.norm(grid[:, None] - grid[None], axis=-1)
        bni = np.argsort(d, axis=1)[:, 1 : nn + 1]
        bi = np.arange(batch)
        pairwise = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(grid), bni
        )
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(grid), jnp.asarray(grid), bi, bni
        )
        batch_targets = jnp.asarray(targets)  # (b, 3)
        batch_nn_targets = jnp.asarray(
            targets[bni].swapaxes(-2, -1)
        )  # (b, 3, nn)

        opt = L_BFGS_B_optimize(
            model, batch_targets, batch_nn_targets, crosswise, pairwise,
            loss_fn=mse_fn,
        )
        ls = float(opt.kernel.deformation.length_scale())
        # the optimizer must actually move toward the truth, not just stay
        # inside bounds: closer than the 0.15 init and within 25% sq-rel-err
        assert abs(ls - ls_true) < abs(0.15 - ls_true), f"ls={ls}"
        assert ((ls_true - ls) / ls_true) ** 2 < 2.5e-1, f"ls={ls}"

    @pytest.mark.slow
    def test_device_chassis_shear_recovery(self, grid, rng):
        """The on-device L-BFGS chassis trains the SHEAR model class too
        (generic objective under one lax.while_loop program): optimum
        matches the scipy chassis on the same draw."""
        from muygpys_tpu.optimize import (
            Device_LBFGS_optimize, L_BFGS_B_optimize, mse_fn,
        )

        ls_true, noise = 0.10, 1e-5
        n = grid.shape[0]
        Kdense = _dense_shear_cov(grid, grid, ls_true)
        L = np.linalg.cholesky(Kdense + 1e-8 * np.eye(3 * n))
        flat = L @ rng.standard_normal(3 * n)
        targets = flat.reshape(3, n).T

        model = MuyGPS(
            kernel=ShearKernel(
                deformation=DifferenceIsotropy(
                    F2, length_scale=Parameter(0.15, (0.02, 0.3))
                )
            ),
            noise=ShearNoise33(noise),
            scale=FixedScale(),
        )
        nn = 12
        d = np.linalg.norm(grid[:, None] - grid[None], axis=-1)
        bni = np.argsort(d, axis=1)[:, 1 : nn + 1]
        bi = np.arange(n)
        pairwise = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(grid), bni
        )
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(grid), jnp.asarray(grid), bi, bni
        )
        bt = jnp.asarray(targets)
        bnt = jnp.asarray(targets[bni].swapaxes(-2, -1))

        oracle = L_BFGS_B_optimize(
            model, bt, bnt, crosswise, pairwise, loss_fn=mse_fn
        )
        opt = Device_LBFGS_optimize(
            model, bt, bnt, crosswise, pairwise, loss_fn=mse_fn
        )
        ls_o = float(oracle.kernel.deformation.length_scale())
        ls_d = float(opt.kernel.deformation.length_scale())
        assert np.isclose(ls_d, ls_o, rtol=1e-3), (ls_d, ls_o)


class TestLanesMultiout:
    """The batch-on-lanes multi-output serve path must agree with the
    generic flattened solve (muygpys_tpu/ops/solve.py) for both shear
    kernels — one shared Cholesky, full (O, O) posterior covariance."""

    @pytest.mark.parametrize("family", ["33", "23"])
    def test_matches_generic_posteriors(self, grid, rng, family):
        ls, noise = 0.12, 1e-4
        n = grid.shape[0]
        test = rng.uniform(0.05, 0.95, size=(9, 2))
        nn = 11
        d = np.linalg.norm(test[:, None] - grid[None], axis=-1)
        nn_indices = np.argsort(d, axis=1)[:, :nn]

        if family == "33":
            kernel = ShearKernel(
                deformation=DifferenceIsotropy(F2, length_scale=Parameter(ls))
            )
            noise_model = ShearNoise33(noise)
            targets = rng.standard_normal((n, 3))
        else:
            kernel = ShearKernel2in3out(
                deformation=DifferenceIsotropy(F2, length_scale=Parameter(ls))
            )
            noise_model = HomoscedasticNoise(noise)
            targets = rng.standard_normal((n, 2))
        model = MuyGPS(kernel=kernel, noise=noise_model, scale=FixedScale())

        pairwise = model.kernel.deformation.pairwise_tensor(
            jnp.asarray(grid), nn_indices
        )
        crosswise = model.kernel.deformation.crosswise_tensor(
            jnp.asarray(test), jnp.asarray(grid),
            np.arange(test.shape[0]), nn_indices,
        )
        Kin = model.kernel(pairwise)
        Kcross = model.kernel(crosswise)
        nn_targets = jnp.asarray(targets[nn_indices].swapaxes(-2, -1))

        # jitted: the unrolled m=33 lanes elimination is hundreds of small
        # eager dispatches otherwise; compiles persist in .jax_cache_cpu
        mean_ref = np.asarray(
            jax.jit(model.posterior_mean)(Kin, Kcross, nn_targets)
        )
        var_ref = np.asarray(jax.jit(model.posterior_variance)(Kin, Kcross))
        mean, var = jax.jit(model.posterior_mean_and_variance)(
            Kin, Kcross, nn_targets
        )
        assert mean.shape == mean_ref.shape == (9, 3)
        assert var.shape == var_ref.shape == (9, 3, 3)
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-9, atol=1e-12)
