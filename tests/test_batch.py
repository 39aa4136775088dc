"""Batch sampler tests (mirror of reference ``tests/batch.py``): uniform
sampling without replacement, constant-neighborhood filtering, and class
balancing — the classification-aware batching of SURVEY.md §2.9."""

import numpy as np
import pytest

from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.optimize import (
    full_filtered_batch,
    get_balanced_batch,
    sample_balanced_batch,
    sample_batch,
)


@pytest.fixture(scope="module")
def clustered(rng):
    """Two well-separated clusters with a thin contact zone: interior points
    have constant-label neighborhoods, boundary points do not."""
    n = 400
    a = rng.normal(loc=-0.8, scale=0.7, size=(n // 2, 2))
    b = rng.normal(loc=+0.8, scale=0.7, size=(n // 2, 2))
    X = np.concatenate([a, b])
    labels = np.concatenate([np.zeros(n // 2, int), np.ones(n // 2, int)])
    return X, labels


def test_sample_batch_uniform(clustered, rng):
    X, _ = clustered
    nbrs = NN_Wrapper(X, 10)
    bi, bni = sample_batch(nbrs, 100, X.shape[0], rng=rng)
    assert bi.shape == (100,)
    assert bni.shape == (100, 10)
    assert len(np.unique(bi)) == 100  # without replacement
    assert bi.min() >= 0 and bi.max() < X.shape[0]
    # self-neighbor dropped
    assert not np.any(bni == bi[:, None])


def test_sample_batch_small_data_returns_all(clustered, rng):
    X, _ = clustered
    nbrs = NN_Wrapper(X, 10)
    bi, _ = sample_batch(nbrs, 10_000, X.shape[0], rng=rng)
    np.testing.assert_array_equal(bi, np.arange(X.shape[0]))


def test_full_filtered_batch_drops_constant_neighborhoods(clustered):
    X, labels = clustered
    nbrs = NN_Wrapper(X, 10)
    bi, bni = full_filtered_batch(nbrs, labels)
    nn_labels = labels[bni]
    # every kept neighborhood mixes classes
    assert np.all(nn_labels.max(axis=1) != nn_labels.min(axis=1))
    # and interior points (constant neighborhoods) were dropped
    assert 0 < len(bi) < X.shape[0]
    # complement check: every dropped index has a constant neighborhood
    dropped = np.setdiff1d(np.arange(X.shape[0]), bi)
    all_nn, _ = nbrs.get_batch_nns(dropped)
    dl = labels[np.asarray(all_nn)]
    assert np.all(dl.max(axis=1) == dl.min(axis=1))


def test_sample_balanced_batch_balances_classes(clustered, rng):
    X, labels = clustered
    nbrs = NN_Wrapper(X, 10)
    bi, bni = sample_balanced_batch(nbrs, labels, 60, rng=rng)
    counts = np.bincount(labels[bi])
    assert counts.max() - counts.min() <= 1  # near-exact balance
    assert len(bi) <= 60
    nn_labels = labels[bni]
    assert np.all(nn_labels.max(axis=1) != nn_labels.min(axis=1))


def test_get_balanced_batch_dispatch(clustered, rng):
    X, labels = clustered
    nbrs = NN_Wrapper(X, 10)
    # large request -> full filtered batch
    bi_full, _ = get_balanced_batch(nbrs, labels, X.shape[0] + 1, rng=rng)
    bi_ref, _ = full_filtered_batch(nbrs, labels)
    np.testing.assert_array_equal(bi_full, bi_ref)
    # small request -> balanced sample
    bi_small, _ = get_balanced_batch(nbrs, labels, 40, rng=rng)
    assert len(bi_small) <= 40
