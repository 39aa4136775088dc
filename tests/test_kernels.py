"""Kernel conformance tests — sklearn/scipy oracles.

Mirrors the reference's strategy in tests/kernels.py:9-10 (sklearn Matern/RBF
as the trusted answer) and extends it with Bessel-vs-scipy coverage for the
JAX-native general-smoothness path.
"""

import numpy as np
import scipy.special
import jax
import jax.numpy as jnp
import pytest
from sklearn.gaussian_process.kernels import Matern as SkMatern
from sklearn.gaussian_process.kernels import RBF as SkRBF

from muygpys_tpu.gp.deformation import Anisotropy, F2, Isotropy, l2
from muygpys_tpu.gp.hyperparameter import Parameter, VectorParameter
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.ops import kernels as k
from muygpys_tpu.ops.bessel import kv


class TestBessel:
    def test_kv_vs_scipy(self):
        vs = [0.0, 0.1, 0.5, 1.0, 1.5, 2.5, 3.7, 7.2, 15.0]
        xs = np.concatenate(
            [np.logspace(-6, 0.3, 25), np.linspace(1.9, 2.1, 7),
             np.linspace(2.2, 60, 30)]
        )
        # ONE jitted vmap over the (v, x) grid: 9 eager recurrence sweeps
        # cost ~12 s of dispatch; the compile persists in .jax_cache_cpu
        V, X = np.meshgrid(vs, xs, indexing="ij")
        got = np.asarray(
            jax.jit(jax.vmap(kv))(
                jnp.asarray(V.ravel()), jnp.asarray(X.ravel())
            )
        ).reshape(V.shape)
        want = scipy.special.kv(V, X)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_kv_stress_near_integer_nu_and_large_x(self):
        """Adversarial regimes (r1 VERDICT weak #7): the Temme series has
        removable singularities at integer nu — approach them from both
        sides at 1e-6 and 1e-7 offsets — and large x drives the Steed CF2
        branch deep into exponential underflow territory."""
        vs = [
            1e-8, 1.0 - 1e-7, 1.0 + 1e-7, 2.0 - 1e-6, 2.0 + 1e-6,
            5.0 - 1e-6, 5.0 + 1e-6, 10.0 - 1e-7, 10.0 + 1e-7,
        ]
        xs = np.concatenate(
            [np.logspace(-8, 0, 9), np.linspace(1.99, 2.01, 5),
             np.logspace(0.5, 2.47, 12)]  # up to x~295: kv ~ 1e-130
        )
        V, X = np.meshgrid(vs, xs, indexing="ij")
        got = np.asarray(
            jax.jit(jax.vmap(kv))(
                jnp.asarray(V.ravel()), jnp.asarray(X.ravel())
            )
        ).reshape(V.shape)
        want = scipy.special.kv(V, X)
        np.testing.assert_allclose(got, want, rtol=5e-9)

    def test_kv_nu_gradient_near_integers(self):
        """Exact d/dnu stays accurate approaching the integer-nu removable
        singularities.  ONE jitted vmap over the grid: per-point eager
        grads cost ~35 s of dispatch through the recurrences."""
        vs = np.array([0.9999, 1.0001, 2.00001, 4.99999])
        xs = np.array([0.05, 1.0, 8.0])
        V, X = np.meshgrid(vs, xs, indexing="ij")
        gv = np.asarray(
            jax.jit(jax.vmap(jax.grad(kv, argnums=0)))(
                jnp.asarray(V.ravel()), jnp.asarray(X.ravel())
            )
        )
        h = 1e-7
        fdv = (
            scipy.special.kv(V.ravel() + h, X.ravel())
            - scipy.special.kv(V.ravel() - h, X.ravel())
        ) / (2 * h)
        rel = np.abs(gv - fdv) / np.maximum(np.abs(fdv), 1e-12)
        assert rel.max() < 1e-3, rel

    def test_kv_gradients(self):
        v0, x0 = 1.7, 3.0
        gx = jax.jit(jax.grad(lambda x: kv(v0, x)))(x0)
        fdx = (
            scipy.special.kv(v0, x0 + 1e-6) - scipy.special.kv(v0, x0 - 1e-6)
        ) / 2e-6
        assert abs(gx - fdx) < 1e-7
        gv = jax.jit(jax.grad(lambda v: kv(v, x0)))(v0)
        fdv = (
            scipy.special.kv(v0 + 1e-6, x0) - scipy.special.kv(v0 - 1e-6, x0)
        ) / 2e-6
        assert abs(gv - fdv) < 1e-6


class TestScalarKernels:
    @pytest.fixture(scope="class")
    def dists(self, rng):
        return np.abs(rng.normal(size=(200,))) * 2.5

    @pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 0.9, 1.9, 3.3, 4.8])
    def test_matern_vs_sklearn(self, dists, nu):
        fns = {0.5: k.matern_05_fn, 1.5: k.matern_15_fn, 2.5: k.matern_25_fn}
        if nu in fns:
            got = np.array(fns[nu](jnp.asarray(dists)))
        else:
            got = np.array(k.matern_gen_fn(jnp.asarray(dists), nu))
        want = SkMatern(nu=nu)(np.zeros((1, 1)), dists[:, None])[0]
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)

    def test_matern_gen_matches_closed_forms(self, dists):
        d = jnp.asarray(dists)
        for nu, closed in [
            (0.5, k.matern_05_fn),
            (1.5, k.matern_15_fn),
            (2.5, k.matern_25_fn),
        ]:
            np.testing.assert_allclose(
                k.matern_gen_fn(d, nu), closed(d), rtol=1e-9, atol=1e-12
            )

    def test_matern_gen_at_zero(self):
        got = k.matern_gen_fn(jnp.asarray([0.0, 1.0]), 1.9)
        assert float(got[0]) == 1.0

    def test_rbf(self, dists):
        got = np.array(k.rbf_fn(jnp.asarray(dists**2)))
        want = SkRBF()(np.zeros((1, 1)), dists[:, None])[0]
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestKernelFunctors:
    @pytest.fixture(scope="class")
    def tensors(self, rng):
        data = rng.normal(size=(50, 3))
        nn = rng.integers(0, 50, size=(50, 8))
        return data, nn

    @pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 1.9])
    @pytest.mark.parametrize("ls", [0.5, 1.0, 2.0])
    def test_matern_isotropy(self, tensors, nu, ls):
        data, nn = tensors
        kern = Matern(
            smoothness=Parameter(nu),
            deformation=Isotropy(l2, length_scale=Parameter(ls)),
        )
        pairwise = kern.deformation.pairwise_tensor(jnp.asarray(data), nn)
        Kin = np.array(kern(pairwise))
        sk = SkMatern(length_scale=ls, nu=nu)
        for i in range(0, 50, 17):
            want = sk(data[nn[i]])
            np.testing.assert_allclose(Kin[i], want, rtol=1e-6, atol=1e-8)

    @pytest.mark.parametrize("ls", [0.5, 2.0])
    def test_rbf_isotropy(self, tensors, ls):
        data, nn = tensors
        kern = RBF(deformation=Isotropy(F2, length_scale=Parameter(ls)))
        pairwise = kern.deformation.pairwise_tensor(jnp.asarray(data), nn)
        Kin = np.array(kern(pairwise))
        sk = SkRBF(length_scale=ls)
        for i in range(0, 50, 17):
            np.testing.assert_allclose(
                Kin[i], sk(data[nn[i]]), rtol=1e-8, atol=1e-10
            )

    def test_matern_anisotropy(self, tensors, rng):
        data, nn = tensors
        ls = np.array([0.5, 1.5, 2.5])
        kern = Matern(
            smoothness=Parameter(1.5),
            deformation=Anisotropy(
                l2,
                length_scale=VectorParameter(
                    *(Parameter(v) for v in ls)
                ),
            ),
        )
        pairwise = kern.deformation.pairwise_tensor(jnp.asarray(data), nn)
        assert pairwise.shape == (50, 8, 8, 3)
        Kin = np.array(kern(pairwise))
        sk = SkMatern(length_scale=1.0, nu=1.5)
        for i in range(0, 50, 23):
            want = sk(data[nn[i]] / ls)
            np.testing.assert_allclose(Kin[i], want, rtol=1e-6, atol=1e-8)

    def test_opt_kwarg_override(self, tensors):
        """Free params arrive as kwargs; passing them must override stored."""
        data, nn = tensors
        kern = Matern(
            smoothness=Parameter(0.6, (0.1, 3.0)),
            deformation=Isotropy(l2, length_scale=Parameter(1.0, (0.1, 5.0))),
        )
        pairwise = kern.deformation.pairwise_tensor(jnp.asarray(data), nn)
        K1 = kern(pairwise, smoothness=1.9, length_scale=0.7)
        kern2 = Matern(
            smoothness=Parameter(1.9),
            deformation=Isotropy(l2, length_scale=Parameter(0.7)),
        )
        # kern2 with fixed nu=1.9 uses the general path only if free; compare
        # against direct general evaluation
        K2 = k.matern_gen_fn(
            kern2.deformation(pairwise, length_scale=0.7), 1.9
        )
        np.testing.assert_allclose(K1, K2, rtol=1e-10)

    def test_opt_params_lists(self):
        kern = Matern(
            smoothness=Parameter(0.6, (0.1, 3.0)),
            deformation=Isotropy(l2, length_scale=Parameter(1.0, (0.1, 5.0))),
        )
        names, params, bounds = kern.get_opt_params()
        assert names == ["length_scale", "smoothness"]
        assert params == [1.0, 0.6]
        assert bounds == [(0.1, 5.0), (0.1, 3.0)]

    def test_jit_grad_through_kernel(self, tensors):
        data, nn = tensors
        kern = Matern(
            smoothness=Parameter(1.2, (0.1, 3.0)),
            deformation=Isotropy(l2, length_scale=Parameter(1.0, (0.1, 5.0))),
        )
        pairwise = kern.deformation.pairwise_tensor(jnp.asarray(data), nn)

        @jax.jit
        def f(ls, nu):
            return jnp.sum(kern(pairwise, length_scale=ls, smoothness=nu))

        g = jax.grad(f, argnums=(0, 1))(1.0, 1.2)
        assert np.isfinite(g[0]) and np.isfinite(g[1])
