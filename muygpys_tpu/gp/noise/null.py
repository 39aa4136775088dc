"""Null (zero) noise model.

API parity: reference ``gp/noise/null.py:20``.
"""

from __future__ import annotations

from typing import Callable

from muygpys_tpu.gp.hyperparameter import Parameter
from muygpys_tpu.gp.noise.noise_fn import NoiseFn


class NullNoise(Parameter, NoiseFn):
    """Zero-noise assumption; perturbation is the identity."""

    def __init__(self, *args, **kwargs):
        self._val = 0.0
        self._bounds = (0.0, 0.0)
        self._fixed = True
        self._name = "noise"

    def name(self) -> str:
        return self._name

    def __call__(self, *args, **kwargs):
        return 0.0

    def perturb(self, Kin, **kwargs):
        return Kin

    def perturb_fn(self, fn: Callable) -> Callable:
        return fn
