"""The Matern kernel functor.

API parity: reference ``gp/kernels/matern.py:85`` with the smoothness
specialization of ``_set_matern_fn`` (:61-81): fixed half-integer / infinite
smoothness uses the cheap closed forms; free or general smoothness uses the
JAX-native Bessel path (:mod:`muygpys_tpu.ops.bessel`) which — unlike the
reference — is differentiable in the smoothness parameter, so gradient-based
optimizers can train it.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax.numpy as jnp

from muygpys_tpu.gp.deformation import DeformationFn, Isotropy, l2
from muygpys_tpu.gp.hyperparameter import NamedParameter, Parameter
from muygpys_tpu.gp.kernels.kernel_fn import KernelFn
from muygpys_tpu.ops import kernels as _k


def _set_matern_fn(
    smoothness: Parameter,
    _backend_05_fn: Callable = _k.matern_05_fn,
    _backend_15_fn: Callable = _k.matern_15_fn,
    _backend_25_fn: Callable = _k.matern_25_fn,
    _backend_inf_fn: Callable = _k.matern_inf_fn,
    _backend_gen_fn: Callable = _k.matern_gen_fn,
) -> Callable:
    if smoothness.fixed():
        val = smoothness()
        if val == 0.5:
            return lambda dists, **kwargs: _backend_05_fn(dists)
        elif val == 1.5:
            return lambda dists, **kwargs: _backend_15_fn(dists)
        elif val == 2.5:
            return lambda dists, **kwargs: _backend_25_fn(dists)
        elif val == math.inf:
            return lambda dists, **kwargs: _backend_inf_fn(dists)

    def gen_fn(dists, smoothness, **kwargs):
        return _backend_gen_fn(dists, smoothness)

    return gen_fn


class Matern(KernelFn):
    """Matern kernel over a deformation, with trainable smoothness."""

    def __init__(
        self,
        smoothness: Parameter = None,
        deformation: DeformationFn = None,
        **_backend_fns,
    ):
        if smoothness is None:
            smoothness = Parameter(0.5)
        if deformation is None:
            deformation = Isotropy(l2, length_scale=Parameter(1.0))
        super().__init__(deformation=deformation)
        self.smoothness = NamedParameter("smoothness", smoothness)
        self._backend_fns = _backend_fns
        self._make()

    def _make(self):
        super()._make_base()
        self.smoothness.populate(self._hyperparameters)
        self._kernel_fn = _set_matern_fn(self.smoothness, **self._backend_fns)
        self._predef_fn = self.smoothness.apply_fn(self._kernel_fn)
        self._fn = self.deformation.length_scale.apply_embedding_fn(
            self._predef_fn, self.deformation
        )

    def __call__(self, diffs, **kwargs):
        """Evaluate the kernel on a (pairwise or crosswise) distance or
        difference tensor, as dictated by the deformation."""
        return self._fn(diffs, **kwargs)

    def Kout(self, **kwargs) -> jnp.ndarray:
        """Prior variance of an observable: scalar 1."""
        return jnp.squeeze(jnp.ones((1, 1)))

    def get_opt_params(
        self,
    ) -> Tuple[List[str], List[float], List[Tuple[float, float]]]:
        names, params, bounds = super().get_opt_params()
        self.smoothness.append_lists(names, params, bounds)
        return names, params, bounds

    def get_opt_fn(self) -> Callable:
        return self._fn
