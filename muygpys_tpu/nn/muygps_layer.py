"""MuyGPs as a flax layer for deep kernel learning.

TPU-native rebuild of the reference's torch integration
(``torch/muygps_layer.py:24-164`` ``MuyGPs_layer``): a flax ``nn.Module``
whose trainable leaves are the GP hyperparameters (log-reparameterized for
positivity — an improvement over the torch layer's unconstrained raw values)
and whose ``__call__`` maps embedded features to (posterior mean, variance)
over fixed batch neighborhoods.  Like the reference layer, restricted to
Matern + Isotropy with scalar length scale (``torch/muygps_layer.py:108-120``);
unlike torch, general (non-half-integer) smoothness is supported because the
Bessel path (:mod:`muygpys_tpu.ops.bessel`) is differentiable.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from muygpys_tpu.gp.deformation.isotropy import Isotropy
from muygpys_tpu.gp.hyperparameter.scalar import Parameter as ScalarParam
from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.ops import kernels as _k
from muygpys_tpu.ops import noise as _noise
from muygpys_tpu.ops import solve as _solve


def _matern_fn_for(smoothness: float):
    if smoothness == 0.5:
        return lambda d, _s: _k.matern_05_fn(d)
    if smoothness == 1.5:
        return lambda d, _s: _k.matern_15_fn(d)
    if smoothness == 2.5:
        return lambda d, _s: _k.matern_25_fn(d)
    if smoothness == math.inf:
        return lambda d, _s: _k.matern_inf_fn(d)
    return _k.matern_gen_fn


class MuyGPsLayer(nn.Module):
    """Final GP layer: embedded features -> (mean, variance).

    Attributes:
        muygps_model: the MuyGPS spec providing initial hyperparameter values
            (length_scale, noise, fixed smoothness).
        train_smoothness: if True, smoothness is also a trainable leaf.
    """

    muygps_model: MuyGPS
    train_smoothness: bool = False

    def _validate(self):
        deformation = self.muygps_model.kernel.deformation
        if not isinstance(deformation, Isotropy):
            raise NotImplementedError(
                "MuyGPsLayer does not support "
                f"{type(deformation)} deformations"
            )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        batch_indices: jnp.ndarray,
        batch_nn_indices: jnp.ndarray,
        batch_nn_targets: jnp.ndarray,
    ):
        """Args: ``x`` — embedded features of the full training set."""
        self._validate()
        model = self.muygps_model
        ls0 = float(model.kernel.deformation.length_scale())
        noise0 = float(model.noise())
        nu0 = float(model.kernel.smoothness())

        log_ls = self.param(
            "log_length_scale", lambda _k_: jnp.asarray(math.log(ls0))
        )
        log_noise = self.param(
            "log_noise", lambda _k_: jnp.asarray(math.log(max(noise0, 1e-12)))
        )
        length_scale = jnp.exp(log_ls)
        noise = jnp.exp(log_noise)
        if self.train_smoothness:
            smoothness = jnp.exp(
                self.param(
                    "log_smoothness",
                    lambda _k_: jnp.asarray(math.log(nu0)),
                )
            )
            matern = _k.matern_gen_fn
        else:
            smoothness = nu0
            matern = _matern_fn_for(nu0)

        deformation = model.kernel.deformation
        crosswise = deformation.crosswise_tensor(
            x, x, batch_indices, batch_nn_indices
        )
        pairwise = deformation.pairwise_tensor(x, batch_nn_indices)

        Kcross = matern(
            deformation.metric.apply_length_scale(crosswise, length_scale),
            smoothness,
        )
        Kin = _noise.homoscedastic_perturb(
            matern(
                deformation.metric.apply_length_scale(
                    pairwise, length_scale
                ),
                smoothness,
            ),
            noise,
        )
        Kout = jnp.ones((), Kin.dtype)
        mean, var = _solve.posterior_mean_and_variance(
            Kin, Kcross, Kout, batch_nn_targets
        )
        # floor the variance: embedded points can (near-)collapse, driving the
        # posterior variance to numerical zero or slightly negative, which
        # would NaN any log-likelihood loss
        eps = 1e-10 if var.dtype == jnp.float64 else 1e-6
        return mean, jnp.maximum(var, eps)


class MultivariateMuyGPsLayer(nn.Module):
    """Multivariate final GP layer: one kernel per response dimension.

    Parity with the reference's deprecated ``MultivariateMuyGPs_layer``
    (``torch/multivariate_muygps_layer.py:27``): per-response trainable
    (log) length scales and noises over a shared embedded space.
    """

    muygps_model: "object"  # MultivariateMuyGPS
    train_smoothness: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        batch_indices: jnp.ndarray,
        batch_nn_indices: jnp.ndarray,
        batch_nn_targets: jnp.ndarray,
    ):
        means, variances = [], []
        for i, model in enumerate(self.muygps_model.models):
            layer = MuyGPsLayer(
                muygps_model=model,
                train_smoothness=self.train_smoothness,
                name=f"response_{i}",
            )
            mean_i, var_i = layer(
                x,
                batch_indices,
                batch_nn_indices,
                batch_nn_targets[:, :, i : i + 1],
            )
            means.append(mean_i.reshape(-1))
            variances.append(var_i.reshape(-1))
        return jnp.stack(means, axis=1), jnp.stack(variances, axis=1)


class DeepKernelMuyGPs(nn.Module):
    """Convenience wrapper: an embedding network feeding a MuyGPs layer.

    Mirrors the reference's convention of a model with ``.embedding`` and
    ``.GP_layer`` components (``examples/muygps_torch.py:297-471``).
    """

    embedding: nn.Module
    muygps_model: MuyGPS
    train_smoothness: bool = False

    def setup(self):
        self.gp_layer = MuyGPsLayer(
            muygps_model=self.muygps_model,
            train_smoothness=self.train_smoothness,
        )

    def embed(self, features: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(features)

    def __call__(
        self,
        train_features: jnp.ndarray,
        batch_indices: jnp.ndarray,
        batch_nn_indices: jnp.ndarray,
        batch_nn_targets: jnp.ndarray,
    ):
        embedded = self.embedding(train_features)
        return self.gp_layer(
            embedded, batch_indices, batch_nn_indices, batch_nn_targets
        )
