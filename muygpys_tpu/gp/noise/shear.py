"""Lensing-specific shear noise.

API parity: reference ``gp/noise/shear.py:19`` (``ShearNoise33``): doubled
tau^2 on the convergence block of the flattened ``(b, 3, nn, 3, nn)``
covariance.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

from muygpys_tpu.gp.noise.homoscedastic import HomoscedasticNoise
from muygpys_tpu.ops.noise import shear_perturb33


class ShearNoise33(HomoscedasticNoise):
    """Homoscedastic noise with 2x variance on the convergence output."""

    def __init__(
        self,
        val: Union[str, float],
        bounds: Union[str, Tuple[float, float]] = "fixed",
        _backend_fn: Callable = shear_perturb33,
    ):
        super().__init__(val, bounds, _backend_fn=_backend_fn)
