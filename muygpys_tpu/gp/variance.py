"""Posterior variance functor.

API parity: reference ``gp/variance.py:22-52``: the public call applies the
sigma^2 scale; ``get_opt_fn`` exposes the *unscaled* variant used inside LOO
objectives (the scale is optimized separately per evaluation).
"""

from __future__ import annotations

from typing import Callable

from muygpys_tpu.gp.hyperparameter import ScaleFn
from muygpys_tpu.gp.noise import NoiseFn
from muygpys_tpu.ops.solve import diagonal_variance


class PosteriorVariance:
    """Noise-perturbed, Kout-curried, scale-multiplied variance."""

    def __init__(
        self,
        Kout,
        noise: NoiseFn,
        scale: ScaleFn,
        _backend_fn: Callable = diagonal_variance,
        **kwargs,
    ):
        fn = noise.perturb_fn(_backend_fn)

        def fixed_Kout_fn(Kin, Kcross, *args, **kw):
            return fn(Kin, Kcross, Kout, *args, **kw)

        self._opt_fn = fixed_Kout_fn
        self._fn = scale.scale_fn(fixed_Kout_fn)

    def __call__(self, Kin, Kcross, **kwargs):
        return self._fn(Kin, Kcross, **kwargs)

    def get_opt_fn(self) -> Callable:
        return self._opt_fn
