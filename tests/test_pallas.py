"""Pallas fused predict kernels: interpret-mode conformance on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu.ops import kernels as k
from muygpys_tpu.ops.lanes_solver import serve_mean_and_variance_bl
from muygpys_tpu.pallas.fused_predict import fused_predict_bl


@pytest.fixture(scope="module")
def problem(rng):
    n, B = 12, 256
    pts = np.sort(rng.uniform(size=(B, n)), axis=1)
    pw = jnp.asarray(
        np.abs(pts[:, :, None] - pts[:, None, :]).transpose(1, 2, 0)
    )
    cw = jnp.asarray(np.abs(rng.uniform(size=(B, 1)) - pts).T)
    y = jnp.asarray(rng.standard_normal((B, n)).T)
    return pw, cw, y


import math

from muygpys_tpu.ops.kernels import (
    matern_05_fn,
    matern_15_fn,
    matern_25_fn,
    matern_inf_fn,
)

_KFN = {0.5: matern_05_fn, 1.5: matern_15_fn, 2.5: matern_25_fn,
        math.inf: matern_inf_fn}


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, math.inf])
def test_matches_lanes_solver(problem, nu):
    pw, cw, y = problem
    n = pw.shape[0]
    mean_p, var_p = fused_predict_bl(
        pw, cw, y, jnp.asarray([0.5, 1e-3]), smoothness=nu,
        batch_tile=128, interpret=True,
    )
    eye = jnp.eye(n, dtype=pw.dtype)[:, :, None]
    Kin = _KFN[nu](pw / 0.5) + 1e-3 * eye
    Kc = _KFN[nu](cw / 0.5)
    mean_r, var_r = serve_mean_and_variance_bl(
        Kin, Kc, jnp.asarray(1.0, pw.dtype), y[:, None, :]
    )
    np.testing.assert_allclose(
        np.asarray(mean_p)[0], np.asarray(mean_r)[0], rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_r), rtol=1e-10, atol=1e-12
    )


def test_multivariate_rhs(problem, rng):
    pw, cw, _ = problem
    n, _, B = pw.shape
    y3 = jnp.asarray(rng.standard_normal((n, 3, B)))
    mean_p, var_p = fused_predict_bl(
        pw, cw, y3, jnp.asarray([0.5, 1e-3]), batch_tile=128, interpret=True
    )
    assert mean_p.shape == (3, B)
    eye = jnp.eye(n, dtype=pw.dtype)[:, :, None]
    Kin = matern_15_fn(pw / 0.5) + 1e-3 * eye
    Kc = matern_15_fn(cw / 0.5)
    mean_r, _ = serve_mean_and_variance_bl(
        Kin, Kc, jnp.asarray(1.0, pw.dtype), y3
    )
    np.testing.assert_allclose(
        np.asarray(mean_p), np.asarray(mean_r), rtol=1e-10, atol=1e-12
    )


def test_rejects_ragged_tile(problem):
    pw, cw, y = problem
    with pytest.raises(ValueError, match="divide"):
        fused_predict_bl(pw, cw, y, jnp.asarray([0.5, 1e-3]),
                         batch_tile=100, interpret=True)


from muygpys_tpu.pallas.fused_predict import fused_predict_coords_bl


@pytest.fixture(scope="module")
def coords_problem(rng):
    n, d, B = 12, 3, 256
    nf = jnp.asarray(rng.uniform(size=(n, d, B)))
    q = jnp.asarray(rng.uniform(size=(d, B)))
    y = jnp.asarray(rng.standard_normal((n, 2, B)))
    return nf, q, y


def _oracle_dists(nf, q, ls_vec):
    nf = np.asarray(nf) / np.asarray(ls_vec)[None, :, None]
    q = np.asarray(q) / np.asarray(ls_vec)[:, None]
    dp = np.sqrt(
        ((nf[:, None, :, :] - nf[None, :, :, :]) ** 2).sum(axis=2)
    )
    dc = np.sqrt(((nf - q[None]) ** 2).sum(axis=1))
    return jnp.asarray(dp), jnp.asarray(dc)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, math.inf])
def test_coords_matches_lanes_solver(coords_problem, nu):
    """Coordinate-streaming kernel == lanes oracle on isotropic models."""
    nf, q, y = coords_problem
    n = nf.shape[0]
    ls, noise = 0.7, 1e-2
    mean_p, var_p = fused_predict_coords_bl(
        nf, q, y, jnp.asarray([ls, ls, ls, noise]), smoothness=nu,
        batch_tile=128, interpret=True,
    )
    pw, cw = _oracle_dists(nf, q, [ls] * 3)
    eye = jnp.eye(n, dtype=nf.dtype)[:, :, None]
    Kin = _KFN[nu](pw) + noise * eye
    mean_r, var_r = serve_mean_and_variance_bl(
        Kin, _KFN[nu](cw), jnp.asarray(1.0, nf.dtype), y
    )
    np.testing.assert_allclose(
        np.asarray(mean_p), np.asarray(mean_r), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_r), rtol=1e-9, atol=1e-11
    )


def test_coords_anisotropy(coords_problem):
    """Per-feature length scales (reference Anisotropy semantics)."""
    nf, q, y = coords_problem
    n = nf.shape[0]
    ls_vec = [0.4, 0.9, 2.0]
    noise = 1e-2
    mean_p, var_p = fused_predict_coords_bl(
        nf, q, y, jnp.asarray(ls_vec + [noise]), smoothness=1.5,
        batch_tile=128, interpret=True,
    )
    pw, cw = _oracle_dists(nf, q, ls_vec)
    eye = jnp.eye(n, dtype=nf.dtype)[:, :, None]
    Kin = matern_15_fn(pw) + noise * eye
    mean_r, var_r = serve_mean_and_variance_bl(
        Kin, matern_15_fn(cw), jnp.asarray(1.0, nf.dtype), y
    )
    np.testing.assert_allclose(
        np.asarray(mean_p), np.asarray(mean_r), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_r), rtol=1e-9, atol=1e-11
    )


def test_coords_heteroscedastic(coords_problem, rng):
    """Per-neighbor nugget tensor (reference heteroscedastic semantics,
    _src/gp/noise/numpy.py:56-67)."""
    nf, q, y = coords_problem
    n, _, B = nf.shape
    ls = 0.7
    eps = jnp.asarray(1e-3 + 1e-2 * rng.uniform(size=(n, B)))
    mean_p, var_p = fused_predict_coords_bl(
        nf, q, y, jnp.asarray([ls, ls, ls, 0.0]), noise_nn=eps,
        smoothness=1.5, batch_tile=128, interpret=True,
    )
    pw, cw = _oracle_dists(nf, q, [ls] * 3)
    eye = jnp.eye(n, dtype=nf.dtype)[:, :, None]
    Kin = matern_15_fn(pw) + eye * eps[:, None, :]
    mean_r, var_r = serve_mean_and_variance_bl(
        Kin, matern_15_fn(cw), jnp.asarray(1.0, nf.dtype), y
    )
    np.testing.assert_allclose(
        np.asarray(mean_p), np.asarray(mean_r), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_r), rtol=1e-9, atol=1e-11
    )


def test_coords_rbf_f2(coords_problem):
    """RBF on the F2 metric (metric_power=2)."""
    from muygpys_tpu.ops.kernels import rbf_fn

    nf, q, y = coords_problem
    n = nf.shape[0]
    ls, noise = 0.7, 1e-2
    mean_p, var_p = fused_predict_coords_bl(
        nf, q, y, jnp.asarray([ls, ls, ls, noise]), smoothness="rbf",
        metric_power=2, batch_tile=128, interpret=True,
    )
    pw, cw = _oracle_dists(nf, q, [ls] * 3)
    eye = jnp.eye(n, dtype=nf.dtype)[:, :, None]
    Kin = rbf_fn(pw**2) + noise * eye
    mean_r, var_r = serve_mean_and_variance_bl(
        Kin, rbf_fn(cw**2), jnp.asarray(1.0, nf.dtype), y
    )
    np.testing.assert_allclose(
        np.asarray(mean_p), np.asarray(mean_r), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_r), rtol=1e-9, atol=1e-11
    )
