"""Heteroscedastic (per-observation diagonal) noise.

API parity: reference ``gp/noise/heteroscedastic.py:21``.  Unlike the
reference, this works under batch sharding (the perturbation is elementwise
along the batch dim; the reference's MPI backend raises NotImplementedError,
``_src/gp/noise/mpi.py:13-17``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from muygpys_tpu.gp.hyperparameter import TensorParam
from muygpys_tpu.gp.noise.noise_fn import NoiseFn
from muygpys_tpu.ops.noise import heteroscedastic_perturb


class HeteroscedasticNoise(TensorParam, NoiseFn):
    """A ``(batch_count, nn_count)`` tensor of per-neighbor noise variances."""

    def __init__(
        self, val, _backend_fn: Callable = heteroscedastic_perturb
    ):
        super().__init__(val)
        if jnp.sum(self._val.flatten() < 0) > 0:
            raise ValueError(
                "heteroscedastic noise values are not strictly non-negative"
            )
        self._perturb_fn = _backend_fn

    def perturb(self, Kin, **kwargs):
        return self._perturb_fn(Kin, self._val)

    def perturb_fn(self, fn: Callable) -> Callable:
        def perturbed_fn(Kin, *args, **kwargs):
            return fn(self.perturb(Kin), *args, **kwargs)

        return perturbed_fn
