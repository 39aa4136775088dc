"""Tensor assembly unit tests — brute-force oracles.

Mirrors the reference's strategy in tests/kernels.py:43-60 (distances vs
np.linalg.norm over explicit loops).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu._test import oracle
from muygpys_tpu.ops import tensors as t


@pytest.fixture(scope="module")
def data(rng):
    train = rng.normal(size=(100, 5))
    test = rng.normal(size=(40, 5))
    nn_indices = rng.integers(0, 100, size=(40, 10))
    indices = np.arange(40)
    return train, test, indices, nn_indices


def test_crosswise_diffs(data):
    train, test, indices, nn_indices = data
    got = t.crosswise_diffs(
        jnp.asarray(test), jnp.asarray(train), indices, nn_indices
    )
    want = oracle.crosswise_diffs(test, train, indices, nn_indices)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_pairwise_diffs(data):
    train, _, _, nn_indices = data
    got = t.pairwise_diffs(jnp.asarray(train), nn_indices)
    want = oracle.pairwise_diffs(train, nn_indices)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_crosswise_F2_matches_bruteforce(data):
    train, test, indices, nn_indices = data
    got = t.crosswise_F2(
        jnp.asarray(test), jnp.asarray(train), indices, nn_indices
    )
    want = oracle.crosswise_l2(test, train, indices, nn_indices) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_pairwise_F2_matches_bruteforce(data):
    train, _, _, nn_indices = data
    got = t.pairwise_F2(jnp.asarray(train), nn_indices)
    want = oracle.pairwise_l2(train, nn_indices) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_F2_l2_collapse(data):
    train, _, _, nn_indices = data
    diffs = t.pairwise_diffs(jnp.asarray(train), nn_indices)
    np.testing.assert_allclose(
        t.l2(diffs), oracle.pairwise_l2(train, nn_indices), atol=1e-12
    )
    np.testing.assert_allclose(
        t.F2(diffs), oracle.pairwise_l2(train, nn_indices) ** 2, atol=1e-10
    )


def test_1d_feature_handling(rng):
    pts = rng.normal(size=(30,))
    nn = rng.integers(0, 30, size=(7, 4))
    diffs = t.pairwise_diffs(jnp.asarray(pts), nn)
    assert diffs.shape == (7, 4, 4, 1)
    want = pts[nn][:, :, None] - pts[nn][:, None, :]
    np.testing.assert_allclose(diffs[..., 0], want, atol=1e-12)


def test_fast_nn_update():
    nn = np.array([[3, 4, 5], [0, 2, 6], [9, 8, 7]])
    got = t.fast_nn_update(jnp.asarray(nn))
    want = np.array([[0, 3, 4], [1, 0, 2], [2, 9, 8]])
    np.testing.assert_array_equal(got, want)


def test_make_fast_predict_tensors(rng):
    train = rng.normal(size=(20, 3))
    targets = rng.normal(size=(20, 2))
    nn = rng.integers(0, 20, size=(20, 5))
    diffs, y = t.make_fast_predict_tensors(
        jnp.asarray(nn), jnp.asarray(train), jnp.asarray(targets)
    )
    nn_fast = np.concatenate(
        [np.arange(20)[:, None], nn[:, :-1]], axis=1
    )
    np.testing.assert_allclose(
        diffs, oracle.pairwise_diffs(train, nn_fast), atol=1e-12
    )
    np.testing.assert_allclose(y, targets[nn_fast], atol=1e-12)


def test_batch_features_and_heteroscedastic(rng):
    feats = rng.normal(size=(15, 4))
    noise = rng.uniform(size=(15,))
    idx = np.array([2, 5, 7])
    nn = rng.integers(0, 15, size=(3, 6))
    np.testing.assert_allclose(
        t.batch_features_tensor(jnp.asarray(feats), idx), feats[idx]
    )
    np.testing.assert_allclose(
        t.make_heteroscedastic_tensor(jnp.asarray(noise), nn), noise[nn]
    )
