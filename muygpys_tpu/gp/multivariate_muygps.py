"""Multivariate MuyGPS: one kernel per response dimension.

API parity: reference ``gp/multivariate_muygps.py:21`` (methods
``posterior_mean`` :99, ``posterior_variance`` :172, ``fast_coefficients``
:232, ``fast_posterior_mean`` :292, ``optimize_scale`` :342,
``make_predict_tensors`` :386, ``make_train_tensors`` :449).  Deprecated in
the reference in favor of flattened multivariate kernels, but still part of
the public surface.

TPU delta: per-response results are computed with stacked/batched ops and a
single functional update per model (no in-place ``mm.assign`` scatter); the
loop over response dimensions stays a Python loop because each dimension owns
distinct *Python-level* kernel compositions (possibly different smoothness
specializations), exactly as the reference does.
"""

from __future__ import annotations

from typing import Tuple
from warnings import warn

import jax.numpy as jnp

from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.ops.solve import mmuygps_fast_posterior_mean
from muygpys_tpu.ops.tensors import fast_nn_update


class MultivariateMuyGPS:
    """A list of per-response-dimension MuyGPS models with a joint surface."""

    def __init__(self, *model_args):
        warn(
            f"{self.__class__.__name__} is deprecated and will be removed.",
            DeprecationWarning,
            stacklevel=2,
        )
        self.models = [MuyGPS(**args) for args in model_args]

    def fixed(self) -> bool:
        return all(model.fixed() for model in self.models)

    def posterior_mean(
        self, pairwise_diffs, crosswise_diffs, batch_nn_targets
    ) -> jnp.ndarray:
        """``(batch_count, response_count)`` posterior means, one model per
        response column."""
        cols = []
        for i, model in enumerate(self.models):
            Kin = model.kernel(pairwise_diffs)
            Kcross = model.kernel(crosswise_diffs)
            cols.append(
                model.posterior_mean(
                    Kin, Kcross, batch_nn_targets[:, :, i : i + 1]
                ).reshape(-1)
            )
        return jnp.stack(cols, axis=1)

    def posterior_variance(
        self, pairwise_diffs, crosswise_diffs
    ) -> jnp.ndarray:
        """``(batch_count, response_count)`` scaled posterior variances."""
        cols = []
        for model in self.models:
            Kin = model.kernel(pairwise_diffs)
            Kcross = model.kernel(crosswise_diffs)
            cols.append(model.posterior_variance(Kin, Kcross).reshape(-1))
        return jnp.stack(cols, axis=1)

    def fast_coefficients(
        self, pairwise_diffs_fast, train_nn_targets_fast
    ) -> jnp.ndarray:
        """``(train_count, nn_count, response_count)`` precomputed solves."""
        cols = []
        for i, model in enumerate(self.models):
            Kin = model.kernel(pairwise_diffs_fast)
            cols.append(
                model.fast_coefficients(
                    Kin, train_nn_targets_fast[:, :, i : i + 1]
                )
            )
        return jnp.stack(cols, axis=-1)

    def fast_posterior_mean(self, crosswise_diffs, coeffs_tensor):
        """Serve-time means with per-response Kcross: ``(batch, response)``."""
        Kcross = jnp.stack(
            [
                model.kernel(crosswise_diffs)
                for model in self.models
            ],
            axis=-1,
        )
        return mmuygps_fast_posterior_mean(Kcross, coeffs_tensor)

    def optimize_scale(self, pairwise_diffs, nn_targets):
        """Optimize each model's sigma^2 on its response column."""
        for i, model in enumerate(self.models):
            model.optimize_scale(pairwise_diffs, nn_targets[:, :, i : i + 1])
        return self

    def make_predict_tensors(
        self,
        batch_indices,
        batch_nn_indices,
        test_features,
        train_features,
        train_targets,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Delegates to the first model (all models share a deformation
        tensor format)."""
        return self.models[0].make_predict_tensors(
            batch_indices,
            batch_nn_indices,
            test_features,
            train_features,
            train_targets,
            **kwargs,
        )

    def make_train_tensors(
        self,
        batch_indices,
        batch_nn_indices,
        train_features,
        train_targets,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.models[0].make_train_tensors(
            batch_indices,
            batch_nn_indices,
            train_features,
            train_targets,
            **kwargs,
        )
