"""Offline coefficient precompute for the fast posterior mean.

API parity: reference ``gp/fast_precompute.py:20-35``.
"""

from __future__ import annotations

from typing import Callable

from muygpys_tpu.gp.noise import NoiseFn
from muygpys_tpu.ops.solve import fast_posterior_mean_precompute


class FastPrecomputeCoefficients:
    def __init__(
        self,
        noise: NoiseFn,
        _backend_fn: Callable = fast_posterior_mean_precompute,
        **kwargs,
    ):
        self._fn = noise.perturb_fn(_backend_fn)

    def __call__(self, Kin, train_nn_targets_fast, **kwargs):
        return self._fn(Kin, train_nn_targets_fast, **kwargs)

    def get_opt_fn(self) -> Callable:
        return self._fn
