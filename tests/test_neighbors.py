"""KNN index tests: on-device brute force vs sklearn exact oracle."""

import numpy as np
import pytest

from muygpys_tpu.neighbors import NN_Wrapper


@pytest.fixture(scope="module")
def data(rng):
    train = rng.normal(size=(2000, 10))
    test = rng.normal(size=(311, 10))
    return train, test


def test_exact_matches_sklearn(data):
    train, test = data
    nn = 15
    dev = NN_Wrapper(train, nn, nn_method="exact")
    host = NN_Wrapper(train, nn, nn_method="sklearn")
    di, dd = dev.get_nns(test)
    hi, hd = host.get_nns(test)
    np.testing.assert_allclose(dd, hd, rtol=1e-8, atol=1e-10)
    # indices can differ on exact ties; compare via distances instead
    assert (di == hi).mean() > 0.999


def test_batch_nns_drop_self(data):
    train, _ = data
    dev = NN_Wrapper(train, 10, nn_method="exact")
    batch = np.arange(100)
    idx, d2 = dev.get_batch_nns(batch)
    assert idx.shape == (100, 10)
    assert not np.any(idx == batch[:, None])
    assert np.all(d2 > 0)


def test_1d_features(rng):
    train = rng.normal(size=(100,))
    dev = NN_Wrapper(train, 5, nn_method="exact")
    idx, d2 = dev.get_nns(rng.normal(size=(7,)))
    assert idx.shape == (7, 5)
    # distances sorted ascending
    assert np.all(np.diff(d2, axis=1) >= -1e-12)


def test_unknown_method_raises(data):
    train, _ = data
    with pytest.raises(NotImplementedError):
        NN_Wrapper(train, 5, nn_method="kdtree-foo")


def test_hnsw_native(data):
    """In-tree C++ HNSW: high recall vs the exact device index."""
    train, test = data
    nn = 10
    approx = NN_Wrapper(train, nn, nn_method="hnsw", random_seed=7)
    exact = NN_Wrapper(train, nn, nn_method="exact")
    ai, ad = approx.get_nns(test)
    ei, ed = exact.get_nns(test)
    recall = np.mean(
        [len(set(ai[i]) & set(ei[i])) / nn for i in range(len(test))]
    )
    assert recall > 0.9, f"recall={recall}"
    # distances are squared l2, ascending
    assert np.all(np.diff(ad, axis=1) >= -1e-5)
    np.testing.assert_allclose(
        ad[:, 0], ed[:, 0], rtol=1e-4, atol=1e-5
    )


def test_hnsw_batch_nns(data):
    train, _ = data
    approx = NN_Wrapper(train, 8, nn_method="hnsw", random_seed=7)
    batch = np.arange(50)
    idx, d2 = approx.get_batch_nns(batch)
    assert idx.shape == (50, 8)
    assert not np.any(idx == batch[:, None])


def test_scan_knn_matches_direct(rng):
    """The million-scale scan path must agree with the direct path."""
    from muygpys_tpu.neighbors import (
        _brute_force_knn,
        _brute_force_knn_scan,
    )
    import jax.numpy as jnp

    train = jnp.asarray(rng.normal(size=(3000, 6)))
    queries = jnp.asarray(rng.normal(size=(137, 6)))
    di, dd = _brute_force_knn(train, queries, 9)
    si, sd = _brute_force_knn_scan(
        train, queries, 9, query_tile=64, train_tile=512
    )
    np.testing.assert_allclose(np.asarray(sd), np.asarray(dd), rtol=1e-8,
                               atol=1e-10)
    assert (np.asarray(si) == np.asarray(di)).mean() > 0.999
