"""Deep kernel MuyGPs training and prediction (flax/optax).

TPU-native rebuild of ``examples/muygps_torch.py``:
``train_deep_kernel_muygps`` (:297-471 — Adam + exponential LR decay,
NN-index rebuild on the embedded features every ``update_frequency`` epochs),
``predict_model`` (:214), ``update_nearest_neighbors`` (:477).

The train step is a single jitted value_and_grad over all trainable leaves
(embedding weights + log GP hyperparameters); the periodic KNN rebuild is the
only host round-trip.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.ops import loss as _loss


def _resolve_loss(loss_function) -> Callable:
    if callable(loss_function):
        return loss_function
    name = loss_function.lower()
    if name == "mse":
        return lambda mean, targets, var: _loss.mse_fn(mean, targets)
    if name == "l1":
        return lambda mean, targets, var: jnp.sum(jnp.abs(mean - targets))
    if name == "ce":
        return lambda mean, targets, var: _loss.cross_entropy_fn(
            mean, targets
        )
    if name == "bce":
        return lambda mean, targets, var: _loss.cross_entropy_fn(
            mean, targets
        )
    if name == "lool":
        return lambda mean, targets, var: _loss.lool_fn_unscaled(
            mean, targets, var
        )
    raise ValueError(f"loss function {loss_function} is not supported")


def update_nearest_neighbors(
    model,
    params,
    train_features,
    train_responses,
    batch_indices,
    nn_count: int,
    nn_kwargs: Optional[Dict] = None,
) -> Tuple[NN_Wrapper, np.ndarray, jnp.ndarray]:
    """Rebuild the KNN index in the current embedded space.

    Returns (nbrs_lookup, batch_nn_indices, batch_nn_targets).
    """
    embedded = np.asarray(
        model.apply(params, jnp.asarray(train_features), method=model.embed)
    )
    nbrs_lookup = NN_Wrapper(embedded, nn_count, **(nn_kwargs or {}))
    batch_nn_indices, _ = nbrs_lookup.get_batch_nns(np.asarray(batch_indices))
    batch_nn_indices = np.asarray(batch_nn_indices)
    batch_nn_targets = jnp.asarray(train_responses)[batch_nn_indices]
    return nbrs_lookup, batch_nn_indices, batch_nn_targets


def train_deep_kernel_muygps(
    model,
    train_features,
    train_responses,
    batch_indices,
    nbrs_lookup: NN_Wrapper,
    training_iterations: int = 10,
    learning_rate: float = 1e-3,
    scheduler_decay: float = 0.95,
    loss_function="lool",
    update_frequency: int = 1,
    verbose: bool = False,
    nn_kwargs: Optional[Dict] = None,
    rng_key=None,
) -> Tuple[NN_Wrapper, object, dict]:
    """Train embedding + GP hyperparameters jointly.

    Returns (nbrs_lookup on embedded space, trained params, final state info).
    """
    train_features = jnp.asarray(train_features)
    train_responses = jnp.asarray(train_responses)
    batch_indices = np.asarray(batch_indices)
    nn_count = nbrs_lookup.nn_count
    loss_fn = _resolve_loss(loss_function)

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    batch_nn_indices, _ = nbrs_lookup.get_batch_nns(batch_indices)
    batch_nn_indices = np.asarray(batch_nn_indices)
    batch_nn_targets = train_responses[batch_nn_indices]
    batch_responses = train_responses[batch_indices]

    params = model.init(
        rng_key,
        train_features,
        jnp.asarray(batch_indices),
        jnp.asarray(batch_nn_indices),
        batch_nn_targets,
    )

    schedule = optax.exponential_decay(
        learning_rate, transition_steps=1, decay_rate=scheduler_decay
    )
    # clip: lool sums over the batch and explodes when the initial embedding
    # collapses neighborhoods; unclipped Adam then diverges to NaN
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(schedule))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch_nn_indices, batch_nn_targets):
        def objective(p):
            mean, var = model.apply(
                p,
                train_features,
                jnp.asarray(batch_indices),
                batch_nn_indices,
                batch_nn_targets,
            )
            return loss_fn(mean, batch_responses, var)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return loss, params, opt_state

    loss = jnp.nan  # reported when training_iterations == 0
    for epoch in range(training_iterations):
        loss, params, opt_state = train_step(
            params,
            opt_state,
            jnp.asarray(batch_nn_indices),
            batch_nn_targets,
        )
        if verbose and epoch % 10 == 0:
            print(f"epoch {epoch}: loss={float(loss):.6g}")
        if (epoch + 1) % update_frequency == 0:
            nbrs_lookup, batch_nn_indices, batch_nn_targets = (
                update_nearest_neighbors(
                    model, params, train_features, train_responses,
                    batch_indices, nn_count, nn_kwargs,
                )
            )

    return nbrs_lookup, params, {"final_loss": float(loss)}


def predict_model(
    model,
    params,
    test_features,
    train_features,
    train_responses,
    nbrs_lookup: NN_Wrapper,
    nn_count: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict (mean, variance) for test points via the embedded space.

    ``nbrs_lookup`` must be built on the embedded training features (as
    returned by :func:`train_deep_kernel_muygps`).
    """
    train_features = jnp.asarray(train_features)
    test_features = jnp.asarray(test_features)
    train_responses = jnp.asarray(train_responses)

    embedded_test = model.apply(
        params, test_features, method=model.embed
    )
    embedded_train = model.apply(
        params, train_features, method=model.embed
    )
    test_nn_indices, _ = nbrs_lookup.get_nns(np.asarray(embedded_test))
    test_nn_indices = jnp.asarray(np.asarray(test_nn_indices))

    test_count = test_features.shape[0]
    # concatenate embedded test onto train so the GP layer's crosswise
    # indexing can address test rows
    stacked = jnp.concatenate([embedded_train, embedded_test], axis=0)
    train_count = embedded_train.shape[0]
    indices = jnp.arange(test_count) + train_count
    nn_targets = train_responses[test_nn_indices]

    mean, var = model.apply(
        params,
        stacked,
        indices,
        test_nn_indices,
        nn_targets,
        method=lambda m, x, i, ni, nt: m.gp_layer(x, i, ni, nt),
    )
    return mean, var


def predict_single_model(
    model, params, test_features, train_features, train_responses,
    nbrs_lookup: NN_Wrapper, nn_count: int,
):
    """Parity alias for the reference's ``predict_single_model``
    (``examples/muygps_torch.py:53``): univariate GP layer prediction.
    The flax rebuild's :func:`predict_model` is layer-agnostic."""
    return predict_model(
        model, params, test_features, train_features, train_responses,
        nbrs_lookup, nn_count,
    )


def predict_multiple_model(
    model, params, test_features, train_features, train_responses,
    nbrs_lookup: NN_Wrapper, nn_count: int,
):
    """Parity alias for the reference's ``predict_multiple_model``
    (``examples/muygps_torch.py:132``): multivariate GP layer prediction."""
    return predict_model(
        model, params, test_features, train_features, train_responses,
        nbrs_lookup, nn_count,
    )
