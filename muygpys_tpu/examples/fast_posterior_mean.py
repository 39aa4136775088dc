"""Fast posterior mean workflows (offline precompute + cheap serve).

API parity: reference ``examples/fast_posterior_mean.py``
(``make_fast_regressor`` :39, ``make_fast_multivariate_regressor`` :90,
``do_fast_posterior_mean`` :164, ``fast_posterior_mean_any`` :317).

Deviation: the reference applies ``fast_nn_update`` a second time inside
``fast_posterior_mean_any`` (:361) to indices that ``make_fast_regressor``
already self-included, misaligning Kcross columns against the precomputed
coefficients by one position; here the update is applied exactly once.
"""

from __future__ import annotations

from time import perf_counter
from typing import Dict, Tuple, Union

import jax.numpy as jnp
import numpy as np

from muygpys_tpu.examples.from_indices import (
    fast_posterior_mean_from_indices,
)
from muygpys_tpu.gp import MultivariateMuyGPS, MuyGPS
from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.ops.tensors import fast_nn_update


def make_fast_regressor(
    muygps: MuyGPS,
    nbrs_lookup: NN_Wrapper,
    train_features,
    train_targets,
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Precompute ``C = (Kin + eps)^{-1} Y`` over self-inclusive
    neighborhoods; returns (coefficients, self-inclusive nn_indices)."""
    train_features = jnp.asarray(train_features)
    train_targets = jnp.asarray(train_targets)
    train_count = train_features.shape[0]
    nn_indices, _ = nbrs_lookup.get_batch_nns(np.arange(train_count))
    nn_indices = np.asarray(fast_nn_update(jnp.asarray(nn_indices)))

    train_nn_targets = train_targets[nn_indices]
    Kin = muygps.kernel(
        muygps.kernel.deformation.pairwise_tensor(train_features, nn_indices)
    )
    coeffs = muygps.fast_coefficients(Kin, train_nn_targets)
    return coeffs, nn_indices


def make_fast_multivariate_regressor(
    mmuygps: MultivariateMuyGPS,
    nbrs_lookup: NN_Wrapper,
    train_features,
    train_targets,
) -> Tuple[jnp.ndarray, np.ndarray]:
    train_features = jnp.asarray(train_features)
    train_targets = jnp.asarray(train_targets)
    train_count = train_features.shape[0]
    nn_indices, _ = nbrs_lookup.get_batch_nns(np.arange(train_count))
    nn_indices = np.asarray(fast_nn_update(jnp.asarray(nn_indices)))

    pairwise_fast = mmuygps.models[0].kernel.deformation.pairwise_tensor(
        train_features, nn_indices
    )
    train_nn_targets = train_targets[nn_indices]
    coeffs = mmuygps.fast_coefficients(pairwise_fast, train_nn_targets)
    return coeffs, nn_indices


def _decide_and_make_fast_regressor(
    muygps, nbrs_lookup, train_features, train_targets
):
    if isinstance(muygps, MultivariateMuyGPS):
        return make_fast_multivariate_regressor(
            muygps, nbrs_lookup, train_features, train_targets
        )
    return make_fast_regressor(
        muygps, nbrs_lookup, train_features, train_targets
    )


def fast_posterior_mean_any(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    test_features,
    train_features,
    nbrs_lookup: NN_Wrapper,
    train_targets,
) -> Tuple[np.ndarray, jnp.ndarray, Dict]:
    """Offline precompute + serve: 1 KNN query + 1 kernel eval + 1 einsum."""
    test_features = np.asarray(test_features)
    time_start = perf_counter()
    coeffs, nn_indices = _decide_and_make_fast_regressor(
        muygps, nbrs_lookup, train_features, train_targets
    )
    time_precomp = perf_counter()

    test_neighbors, _ = nbrs_lookup.get_nns(test_features)
    time_nn = perf_counter()

    closest_neighbor = np.asarray(test_neighbors)[:, 0]
    closest_set = nn_indices[closest_neighbor, :].astype(int)
    test_count = test_features.shape[0]

    posterior_mean = fast_posterior_mean_from_indices(
        muygps,
        np.arange(test_count),
        closest_set,
        test_features,
        train_features,
        closest_neighbor,
        coeffs,
    )
    time_pred = perf_counter()

    timing = {
        "precompute": time_precomp - time_start,
        "agree": 0.0,
        "nn": time_nn - time_precomp,
        "pred": time_pred - time_nn,
    }
    return np.asarray(posterior_mean), coeffs, timing


def do_fast_posterior_mean(
    test_features,
    train_features,
    train_targets,
    nn_count: int = 30,
    batch_count: int = 200,
    loss_fn=None,
    opt_fn=None,
    k_kwargs=None,
    nn_kwargs: Dict = None,
    opt_kwargs: Dict = None,
    verbose: bool = False,
) -> Tuple[
    Union[MuyGPS, MultivariateMuyGPS],
    NN_Wrapper,
    np.ndarray,
    jnp.ndarray,
    Dict,
]:
    """Full fast-prediction workflow: train a model, precompute coefficients,
    serve fast posterior means for the test set."""
    from muygpys_tpu.examples.regress import _decide_and_make_regressor
    from muygpys_tpu.optimize import Bayes_optimize, lool_fn

    loss_fn = loss_fn if loss_fn is not None else lool_fn
    opt_fn = opt_fn if opt_fn is not None else Bayes_optimize

    muygps, nbrs_lookup = _decide_and_make_regressor(
        train_features, train_targets, nn_count=nn_count,
        batch_count=batch_count, loss_fn=loss_fn, opt_fn=opt_fn,
        k_kwargs=k_kwargs, nn_kwargs=nn_kwargs, opt_kwargs=opt_kwargs,
        verbose=verbose,
    )
    posterior_mean, coeffs, timing = fast_posterior_mean_any(
        muygps, test_features, train_features, nbrs_lookup, train_targets
    )
    if verbose:
        print("fast posterior mean timing:")
        for k, v in timing.items():
            print(f"\t{k} time:{v}s")
    return muygps, nbrs_lookup, posterior_mean, coeffs, timing
