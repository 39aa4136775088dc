"""Index-based convenience glue.

API parity: reference ``examples/from_indices.py`` (``tensors_from_indices``
:22, ``posterior_mean_from_indices`` :42, ``posterior_variance_from_indices``
:59, ``regress_from_indices`` :76, ``fast_posterior_mean_from_indices`` :93,
``optimize_from_indices`` :126).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from muygpys_tpu.gp import MultivariateMuyGPS, MuyGPS
from muygpys_tpu.optimize import OptimizeFn, LossFn, lool_fn


def tensors_from_indices(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    indices,
    nn_indices,
    test_features,
    train_features,
    train_targets,
):
    return muygps.make_predict_tensors(
        np.asarray(indices),
        np.asarray(nn_indices),
        jnp.asarray(test_features),
        jnp.asarray(train_features),
        jnp.asarray(train_targets),
    )


def posterior_mean_from_indices(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    indices,
    nn_indices,
    test_features,
    train_features,
    train_targets,
):
    crosswise, pairwise, nn_targets = tensors_from_indices(
        muygps, indices, nn_indices, test_features, train_features,
        train_targets,
    )
    if isinstance(muygps, MultivariateMuyGPS):
        return muygps.posterior_mean(pairwise, crosswise, nn_targets)
    Kcross = muygps.kernel(crosswise)
    Kin = muygps.kernel(pairwise)
    return muygps.posterior_mean(Kin, Kcross, nn_targets)


def posterior_variance_from_indices(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    indices,
    nn_indices,
    test_features,
    train_features,
    train_targets,
):
    crosswise, pairwise, _ = tensors_from_indices(
        muygps, indices, nn_indices, test_features, train_features,
        train_targets,
    )
    if isinstance(muygps, MultivariateMuyGPS):
        return muygps.posterior_variance(pairwise, crosswise)
    Kcross = muygps.kernel(crosswise)
    Kin = muygps.kernel(pairwise)
    return muygps.posterior_variance(Kin, Kcross)


def regress_from_indices(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    indices,
    nn_indices,
    test_features,
    train_features,
    train_targets,
):
    """(mean, variance) for the indicated test points."""
    crosswise, pairwise, nn_targets = tensors_from_indices(
        muygps, indices, nn_indices, test_features, train_features,
        train_targets,
    )
    if isinstance(muygps, MultivariateMuyGPS):
        return (
            muygps.posterior_mean(pairwise, crosswise, nn_targets),
            muygps.posterior_variance(pairwise, crosswise),
        )
    Kcross = muygps.kernel(crosswise)
    Kin = muygps.kernel(pairwise)
    return (
        muygps.posterior_mean(Kin, Kcross, nn_targets),
        muygps.posterior_variance(Kin, Kcross),
    )


def fast_posterior_mean_from_indices(
    muygps: Union[MuyGPS, MultivariateMuyGPS],
    indices,
    nn_indices,
    test_features,
    train_features,
    closest_index,
    coeffs_tensor,
):
    """Serve-time fast mean against precomputed coefficients."""
    crosswise = muygps.models[0].kernel.deformation.crosswise_tensor(
        jnp.asarray(test_features),
        jnp.asarray(train_features),
        np.asarray(indices),
        np.asarray(nn_indices),
    ) if isinstance(muygps, MultivariateMuyGPS) else (
        muygps.kernel.deformation.crosswise_tensor(
            jnp.asarray(test_features),
            jnp.asarray(train_features),
            np.asarray(indices),
            np.asarray(nn_indices),
        )
    )
    if isinstance(muygps, MultivariateMuyGPS):
        return muygps.fast_posterior_mean(
            crosswise, coeffs_tensor[closest_index]
        )
    Kcross = muygps.kernel(crosswise)
    return muygps.fast_posterior_mean(Kcross, coeffs_tensor[closest_index])


def optimize_from_indices(
    muygps: MuyGPS,
    batch_indices,
    batch_nn_indices,
    train_features,
    train_targets,
    loss_fn: LossFn = lool_fn,
    opt_fn: OptimizeFn = None,
    verbose: bool = False,
    **kwargs,
) -> MuyGPS:
    """Assemble train tensors from indices and run the chassis."""
    from muygpys_tpu.optimize import Bayes_optimize

    if opt_fn is None:
        opt_fn = Bayes_optimize
    crosswise, pairwise, batch_targets, batch_nn_targets = (
        muygps.make_train_tensors(
            np.asarray(batch_indices),
            np.asarray(batch_nn_indices),
            jnp.asarray(train_features),
            jnp.asarray(train_targets),
        )
    )
    return opt_fn(
        muygps,
        batch_targets,
        batch_nn_targets,
        crosswise,
        pairwise,
        loss_fn=loss_fn,
        verbose=verbose,
        **kwargs,
    )
