"""Fast posterior mean functor (serve path; no solve at predict time).

API parity: reference ``gp/fast_mean.py:19-27``.
"""

from __future__ import annotations

from typing import Callable

from muygpys_tpu.ops.solve import fast_posterior_mean


class FastPosteriorMean:
    def __init__(self, _backend_fn: Callable = fast_posterior_mean, **kwargs):
        self._fn = _backend_fn

    def __call__(self, Kcross, coeffs_tensor, **kwargs):
        return self._fn(Kcross, coeffs_tensor, **kwargs)

    def get_opt_fn(self) -> Callable:
        return self._fn
