"""Loss function conformance tests — numpy/sklearn oracles.

Mirrors the reference loss semantics (_src/optimize/loss/numpy.py).
"""

import numpy as np
import scipy.special
import jax.numpy as jnp
import pytest
from sklearn.metrics import log_loss

from muygpys_tpu.ops import loss


@pytest.fixture(scope="module")
def preds(rng):
    b, r = 50, 3
    predictions = rng.normal(size=(b, r))
    targets = rng.normal(size=(b, r))
    variances = rng.uniform(0.1, 2.0, size=(b,))
    return predictions, targets, variances


def test_mse(preds):
    p, t, _ = preds
    got = loss.mse_fn(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(got, np.mean((p - t) ** 2), rtol=1e-12)


def test_cross_entropy(preds, rng):
    p, _, _ = preds
    t = np.zeros_like(p)
    t[np.arange(len(p)), rng.integers(0, p.shape[1], len(p))] = 1.0
    got = loss.cross_entropy_fn(jnp.asarray(p), jnp.asarray(t))
    want = log_loss(
        t, scipy.special.softmax(p, axis=1), normalize=False
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_lool_univariate(preds):
    p, t, v = preds
    p1, t1 = p[:, 0], t[:, 0]
    got = loss.lool_fn(jnp.asarray(p1), jnp.asarray(t1), jnp.asarray(v), 2.0)
    sv = 2.0 * v
    want = np.sum((p1 - t1) ** 2 / sv + np.log(sv))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_lool_multivariate(preds, rng):
    p, t, _ = preds
    b, r = p.shape
    A = rng.normal(size=(b, r, r))
    V = A @ np.swapaxes(A, -2, -1) + 2.0 * np.eye(r)
    got = loss.lool_fn(jnp.asarray(p), jnp.asarray(t), jnp.asarray(V), 1.0)
    resid = p - t
    want = sum(
        resid[i] @ np.linalg.solve(V[i], resid[i])
        + np.linalg.slogdet(V[i])[1]
        for i in range(b)
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_pseudo_huber(preds):
    p, t, _ = preds
    bs = 1.5
    got = loss.pseudo_huber_fn(jnp.asarray(p), jnp.asarray(t), bs)
    want = bs**2 * np.sum(np.sqrt(1 + ((t - p) / bs) ** 2) - 1)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_looph(preds):
    p, t, v = preds
    p1, t1 = p[:, 0], t[:, 0]
    bs, scale = 3.0, 1.7
    got = loss.looph_fn(
        jnp.asarray(p1), jnp.asarray(t1), jnp.asarray(v), scale, bs
    )
    sv = scale * v
    want = np.sum(
        2 * bs**2 * (np.sqrt(1 + (t1 - p1) ** 2 / (bs**2 * sv)) - 1)
        + np.log(sv)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)
