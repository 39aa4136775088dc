"""Certification of the traced-smoothness Matern surrogate.

The Pallas fast paths evaluate general-nu Matern through
:mod:`muygpys_tpu.pallas.matern_nu`: per-step coefficients (exact series +
log-tail Chebyshev) and a cheap elementwise evaluator.  These tests pin the
surrogate against the exact chain (scipy ``kv`` — the reference's numpy
backend oracle, reference ``_src/gp/kernels/numpy.py:34-43``) over the
certified domain nu in [NU_MIN, NU_MAX], t >= 0, plus the exact d/dnu of
:mod:`muygpys_tpu.ops.bessel` against high-order central differences
(round-3 VERDICT items 1-2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import scipy.special

from muygpys_tpu.pallas import matern_nu as mn


@pytest.fixture(scope="module", autouse=True)
def _x64():
    """The certification sweeps need f64; scope the toggle so other test
    modules' precision never depends on collection order (r4 advisor)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def phi_exact(nu, t):
    with np.errstate(all="ignore"):
        out = (
            2.0 ** (1 - nu)
            / scipy.special.gamma(nu)
            * t**nu
            * scipy.special.kv(nu, t)
        )
    return np.where(t <= 0, 1.0, out)


NUS = [0.05, 0.2, 0.31, 0.5, 0.999, 1.0, 1.5, 2.0, 2.5, 3.7, 5.0, 7.3, 10.0]
TS = np.concatenate(
    [[0.0], np.logspace(-3, np.log10(mn.TMAX - 0.1), 120), [45.0, 80.0]]
)


def _mixed_err(got, want, floor):
    return np.max(np.abs(got - want) / np.maximum(np.abs(want), floor))


class TestValue:
    @pytest.mark.parametrize("nu", NUS)
    def test_f64_vs_scipy(self, nu):
        """f64 traced builder: <= 1e-6 mixed error everywhere (<= 1e-8 away
        from exact integers, where the 1e-7 mu-clamp is the floor)."""
        co = mn.matern_nu_coeffs(jnp.float64(nu))
        got = np.asarray(mn.matern_nu_eval(jnp.asarray(TS), co))
        want = phi_exact(nu, TS)
        tol = 1e-6 if abs(nu - round(nu)) < 1e-4 else 1e-8
        dom = TS <= mn.TMAX
        assert _mixed_err(got[dom], want[dom], 1e-6) < tol
        # beyond TMAX the tail extrapolates with e^{-t} decay; values are
        # physically < 4e-11 there — certify absolutely
        assert np.max(np.abs(got[~dom] - want[~dom])) < 1e-10

    @pytest.mark.parametrize("nu", NUS)
    def test_host_builder_f32_eval(self, nu):
        """Host f64 builder + f32 evaluation (the serving configuration):
        <= 4e-6 mixed — inside every f32 serve conformance budget."""
        co = mn.matern_nu_coeffs_host(nu, np.float32)
        got = np.asarray(
            mn.matern_nu_eval(
                jnp.asarray(TS, jnp.float32), jnp.asarray(co)
            ),
            np.float64,
        )
        assert _mixed_err(got, phi_exact(nu, TS), 1e-4) < 4e-6

    def test_matches_closed_forms(self):
        """Half-integer nu agrees with the closed-form kernels."""
        from muygpys_tpu.ops import kernels as k

        d = jnp.asarray(np.linspace(0.0, 8.0, 100))
        for nu, closed in [
            (0.5, k.matern_05_fn),
            (1.5, k.matern_15_fn),
            (2.5, k.matern_25_fn),
        ]:
            got = np.asarray(mn.matern_gen_surrogate(d, jnp.float64(nu)))
            want = np.asarray(closed(d))
            np.testing.assert_allclose(got, want, rtol=2e-8, atol=1e-10)

    def test_zero_distance_is_one(self):
        for nu in (0.31, 1.0, 4.2):
            co = mn.matern_nu_coeffs(jnp.float64(nu))
            got = mn.matern_nu_eval(jnp.zeros(3), co)
            np.testing.assert_array_equal(np.asarray(got), 1.0)


class TestDerivatives:
    @pytest.mark.parametrize("nu", [0.31, 0.999, 1.5, 2.5, 5.0001, 9.5])
    def test_dt_vs_fd(self, nu):
        co = mn.matern_nu_coeffs(jnp.float64(nu))
        tt = TS[(TS > 1e-2) & (TS < mn.TMAX)]
        _, dt = mn.matern_nu_eval(jnp.asarray(tt), co, need_dt=True)
        h = 1e-6
        fd = (phi_exact(nu, tt + h) - phi_exact(nu, tt - h)) / (2 * h)
        assert _mixed_err(np.asarray(dt), fd, 1e-5) < 5e-6

    @pytest.mark.parametrize("nu", [0.31, 0.999, 1.5, 2.5, 5.0001, 9.5])
    def test_dnu_partial_vs_fd(self, nu):
        """The nu-tangent coefficient route (jvp through the builder) vs
        central differences of the exact chain at fixed t."""
        co = mn.matern_nu_coeffs(jnp.float64(nu), need_dnu=True)
        tt = TS[(TS > 1e-2) & (TS < mn.TMAX)]
        _, dnu = mn.matern_nu_eval(jnp.asarray(tt), co, need_dnu=True)
        h = 1e-5
        fd = (phi_exact(nu + h, tt) - phi_exact(nu - h, tt)) / (2 * h)
        assert _mixed_err(np.asarray(dnu), fd, 1e-4) < 5e-6

    def test_clamp_zone_gradient_transparent(self):
        """Exactly-integer nu: the gradient-transparent clamp yields the
        FINITE tangent at the clamped point — within a few percent of the
        true d phi/d nu (an optimizer initialized at Parameter(2.0, ...)
        must see the real slope, not a frozen zero)."""
        co = mn.matern_nu_coeffs(jnp.float64(2.0), need_dnu=True)
        tt = np.asarray([0.5, 1.0, 3.0, 10.0])
        _, dnu = mn.matern_nu_eval(jnp.asarray(tt), co, need_dnu=True)
        h = 1e-5
        fd = (phi_exact(2.0 + h, tt) - phi_exact(2.0 - h, tt)) / (2 * h)
        assert np.all(np.abs(np.asarray(dnu) - fd)
                      <= 0.05 * np.abs(fd) + 1e-6), (dnu, fd)

    def test_builder_differentiable_in_nu(self):
        """jax.grad through the coefficient builder + evaluator matches FD:
        the path the device trainer uses when nu rides the bijector."""

        def f(nu):
            co = mn.matern_nu_coeffs(nu)
            return jnp.sum(mn.matern_nu_eval(jnp.asarray([0.7, 3.0]), co))

        g = float(jax.grad(f)(jnp.float64(1.7)))
        h = 1e-6
        fd = (f(jnp.float64(1.7 + h)) - f(jnp.float64(1.7 - h))) / (2 * h)
        np.testing.assert_allclose(g, float(fd), rtol=1e-5)


class TestBesselOrderDerivative:
    def test_exact_dnu_vs_high_order_fd(self):
        """ops.bessel kve: the forward-mode-through-the-algorithm d/dnu
        matches 4th-order central differences of scipy kv at <= 1e-7
        across nu in (0.3, 5) including near-integers (VERDICT r3 item 2)."""
        from muygpys_tpu.ops.bessel import kv

        vs = np.array(
            [0.31, 0.5, 0.999, 1.0, 1.001, 1.5, 2.0, 2.9999, 3.2, 4.75, 5.0]
        )
        xs = np.array([0.05, 0.3, 1.0, 1.9, 2.0, 2.1, 5.0, 10.0, 40.0])
        V, X = np.meshgrid(vs, xs, indexing="ij")
        Vf, Xf = V.ravel(), X.ravel()
        gv = np.asarray(
            jax.jit(jax.vmap(jax.grad(kv, argnums=0)))(
                jnp.asarray(Vf), jnp.asarray(Xf)
            )
        )
        h = 1e-4
        fd = (
            -scipy.special.kv(Vf + 2 * h, Xf)
            + 8 * scipy.special.kv(Vf + h, Xf)
            - 8 * scipy.special.kv(Vf - h, Xf)
            + scipy.special.kv(Vf - 2 * h, Xf)
        ) / (12 * h)
        scale = np.maximum(
            np.maximum(np.abs(fd), np.abs(scipy.special.kv(Vf, Xf))), 1e-300
        )
        assert np.max(np.abs(gv - fd) / scale) < 1e-7

    def test_f32_kve_finite_at_large_x(self):
        """The f32 CF2 freeze: no NaN up to x ~ 300 (round-4 fix; the
        auxiliary series previously overflowed f32 at x ~ 18)."""
        from muygpys_tpu.ops.bessel import kve

        xs = jnp.asarray(
            np.logspace(0.4, 2.45, 30), jnp.float32
        )
        for v in (0.31, 1.5, 4.8, 9.6):
            got = np.asarray(kve(jnp.float32(v), xs), np.float64)
            want = scipy.special.kve(v, np.asarray(xs, np.float64))
            assert np.all(np.isfinite(got))
            np.testing.assert_allclose(got, want, rtol=5e-3)


class TestF32Builder:
    """The TRACED f32 coefficient builder — the dtype the fused training
    path actually runs (``_vag`` builds coefficients at params_arr's f32
    dtype under x64-off serving processes).  Bounds here are the module
    docstring's certified f32 numbers (r4 advisor: the path was untested
    and the old 3e-3 clamp put the in-zone tangent at ~85%)."""

    TT = np.concatenate(
        [np.linspace(0.05, 1.95, 30), np.linspace(2.05, 12.0, 30)]
    )

    def _errs(self, nu):
        co = mn.matern_nu_coeffs(jnp.float32(nu), need_dnu=True)
        assert co.dtype == jnp.float32  # weak-typed float does not promote
        phi, dnu = mn.matern_nu_eval(
            jnp.asarray(self.TT, jnp.float32), co, need_dnu=True
        )
        pe = phi_exact(nu, self.TT)
        h = 1e-6
        de = (phi_exact(nu + h, self.TT) - phi_exact(nu - h, self.TT)) / (
            2 * h
        )
        verr = np.max(np.abs(np.asarray(phi, np.float64) - pe))
        derr = np.max(
            np.abs(np.asarray(dnu, np.float64) - de)
            / np.maximum(np.abs(de), 1e-2)
        )
        return verr, derr

    @pytest.mark.parametrize("nu", [0.997, 0.999, 1.0, 1.001, 2.0, 3.0])
    def test_in_clamp_zone(self, nu):
        verr, derr = self._errs(nu)
        assert verr < 6e-3, verr  # ~|dphi/dnu| * clamp(1e-2)
        assert derr < 0.18, derr  # measured <= 0.13; cancellation floor

    @pytest.mark.parametrize("nu", [1.03, 1.1, 1.25, 1.5, 2.1, 2.5, 5.2])
    def test_outside_clamp_zone(self, nu):
        verr, derr = self._errs(nu)
        assert verr < 2e-3, verr
        assert derr < 0.02, derr

    def test_sign_preserved_in_zone(self):
        """In-zone the tangent may be up to ~13% off but must never flip
        sign (the optimizer's escape direction)."""
        for nu in (0.999, 1.0, 2.0):
            co = mn.matern_nu_coeffs(jnp.float32(nu), need_dnu=True)
            tt = self.TT[self.TT > 0.2]
            _, dnu = mn.matern_nu_eval(
                jnp.asarray(tt, jnp.float32), co, need_dnu=True
            )
            h = 1e-6
            de = (phi_exact(nu + h, tt) - phi_exact(nu - h, tt)) / (2 * h)
            mask = np.abs(de) > 1e-3
            assert np.all(
                np.sign(np.asarray(dnu, np.float64))[mask]
                == np.sign(de)[mask]
            )


class TestTruncatedTail:
    def test_dt_matches_truncated_value(self):
        """With tail_terms < NTAIL the reported dphi_dt must be the exact
        derivative OF THE EVALUATED (truncated) phi, not of the full
        series (r4 advisor: stored cp came from the 40-term series)."""
        nu = 2.3
        co = mn.matern_nu_coeffs(jnp.float64(nu))
        tt = np.linspace(mn.T0 + 0.3, mn.TMAX - 0.5, 50)

        def phi24(t):
            return mn.matern_nu_eval(t, co, tail_terms=24)

        _, dt = mn.matern_nu_eval(
            jnp.asarray(tt), co, need_dt=True, tail_terms=24
        )
        h = 1e-6
        fd = (phi24(jnp.asarray(tt + h)) - phi24(jnp.asarray(tt - h))) / (
            2 * h
        )
        np.testing.assert_allclose(
            np.asarray(dt), np.asarray(fd), rtol=1e-7, atol=1e-12
        )
