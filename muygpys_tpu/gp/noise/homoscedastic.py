"""Homoscedastic (shared tau^2 I) noise.

API parity: reference ``gp/noise/homoscedastic.py:21`` — including the
``noise=`` opt-time kwarg injection of ``perturb_fn`` (:94-115), which is how
the nugget becomes a free parameter on the jit+grad optimization surface.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

from muygpys_tpu.gp.hyperparameter import NamedParameter, Parameter
from muygpys_tpu.gp.noise.noise_fn import NoiseFn
from muygpys_tpu.ops.noise import homoscedastic_perturb


class HomoscedasticNoise(NamedParameter, NoiseFn):
    """A shared noise prior variance tau^2, named ``"noise"``."""

    def __init__(
        self,
        val: Union[str, float],
        bounds: Union[str, Tuple[float, float]] = "fixed",
        _backend_fn: Callable = homoscedastic_perturb,
    ):
        super().__init__("noise", Parameter(val, bounds))
        if not self.fixed():
            if self._bounds[0] < 0.0 or self._bounds[1] < 0.0:
                raise ValueError(
                    f"homoscedastic noise optimization bounds {self._bounds} "
                    "are not strictly positive"
                )
        self._perturb_fn = _backend_fn

    def perturb(self, Kin, noise: Optional[float] = None, **kwargs):
        if noise is None:
            noise = self._val
        return self._perturb_fn(Kin, noise)

    def perturb_fn(self, fn: Callable) -> Callable:
        def perturbed_fn(Kin, *args, noise=None, **kwargs):
            return fn(self.perturb(Kin, noise=noise), *args, **kwargs)

        return perturbed_fn
