"""Kernel functor base class.

API parity: reference ``gp/kernels/kernel_fn.py:48``.  Kernel functors own a
deformation and a hyperparameter dict, and compose a pure function
``(diffs, **free_params) -> K`` via closure-currying — which is exactly the
shape ``jax.jit``/``jax.grad`` want (free params arrive as traced kwargs).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from muygpys_tpu.gp.deformation import DeformationFn


class KernelFn:
    """Base kernel functor: hyperparameter dict + call mechanism."""

    def __init__(self, deformation: DeformationFn):
        self._hyperparameters: Dict = dict()
        self.deformation = deformation
        self._make_base()

    def _make_base(self):
        self.deformation.length_scale.populate(self._hyperparameters)

    def _make(self):
        raise NotImplementedError(
            "_make is not implemented for base KernelFn"
        )

    def set_params(self, **kwargs) -> None:
        for name in kwargs:
            self._hyperparameters[name]._set(kwargs[name])

    def __call__(self, diffs, **kwargs):
        raise NotImplementedError(
            "__call__ is not implemented for base KernelFn"
        )

    def get_opt_fn(self) -> Callable:
        raise NotImplementedError(
            "get_opt_fn is not implemented for base KernelFn"
        )

    def Kout(self, **kwargs):
        raise NotImplementedError("Kout is not implemented for base KernelFn")

    def get_opt_params(
        self,
    ) -> Tuple[List[str], List[float], List[Tuple[float, float]]]:
        names: List[str] = []
        params: List[float] = []
        bounds: List[Tuple[float, float]] = []
        self.deformation.length_scale.append_lists(names, params, bounds)
        return names, params, bounds

    def __str__(self) -> str:
        return "\n".join(
            f"{name} : {param()} - {param.get_bounds()}"
            for name, param in self._hyperparameters.items()
        )
