"""The RBF kernel functor.

API parity: reference ``gp/kernels/rbf.py:51`` (default deformation
``Isotropy(F2)``; the F2 metric folds the 1/l^2 scaling so the kernel body is
just ``exp(-d2/2)``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from muygpys_tpu.gp.deformation import DeformationFn, F2, Isotropy
from muygpys_tpu.gp.hyperparameter import Parameter
from muygpys_tpu.gp.kernels.kernel_fn import KernelFn
from muygpys_tpu.ops import kernels as _k


class RBF(KernelFn):
    """Radial basis function (squared-exponential) kernel."""

    def __init__(
        self,
        deformation: DeformationFn = None,
        _backend_fn: Callable = _k.rbf_fn,
    ):
        if deformation is None:
            deformation = Isotropy(F2, length_scale=Parameter(1.0))
        super().__init__(deformation=deformation)
        self._kernel_fn = _backend_fn
        self._make()

    def _make(self):
        super()._make_base()
        self._fn = self.deformation.length_scale.apply_embedding_fn(
            lambda dists, **kwargs: self._kernel_fn(dists),
            self.deformation,
        )

    def __call__(self, diffs, **kwargs):
        return self._fn(diffs, **kwargs)

    def Kout(self, **kwargs) -> jnp.ndarray:
        return jnp.squeeze(jnp.ones((1, 1)))

    def get_opt_fn(self) -> Callable:
        return self._fn
