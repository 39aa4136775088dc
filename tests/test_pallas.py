"""Pallas fused predict kernel: interpret-mode conformance on CPU."""

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
        pw, cw, y, 0.5, 1e-3, smoothness=nu, batch_tile=128, interpret=True
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
        pw, cw, y3, 0.5, 1e-3, batch_tile=128, interpret=True
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
        fused_predict_bl(pw, cw, y, 0.5, 1e-3, batch_tile=100,
                         interpret=True)
