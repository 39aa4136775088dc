"""Posterior mean functor.

API parity: reference ``gp/mean.py:17-37``.
"""

from __future__ import annotations

from typing import Callable

from muygpys_tpu.gp.noise import NoiseFn
from muygpys_tpu.ops.solve import posterior_mean


class PosteriorMean:
    """Composes the backend mean solve with the model's noise perturbation."""

    def __init__(
        self,
        noise: NoiseFn,
        _backend_fn: Callable = posterior_mean,
        **kwargs,
    ):
        self._fn = noise.perturb_fn(_backend_fn)

    def __call__(self, Kin, Kcross, batch_nn_targets, **kwargs):
        return self._fn(Kin, Kcross, batch_nn_targets, **kwargs)

    def get_opt_fn(self) -> Callable:
        return self._fn
