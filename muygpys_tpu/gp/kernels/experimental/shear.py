"""Lensing shear kernel functors.

API parity: reference ``gp/kernels/experimental/shear.py`` (``ShearKernel``
:60 with crosswise-shape fixup :126-130 and zero-diff ``Kout`` :132-133;
``ShearKernel2in3out`` :169 with separate Kin/Kcross/Kout functions :212-239
and the ``force_Kcross`` flag :241-265).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp

from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
from muygpys_tpu.gp.hyperparameter import Parameter
from muygpys_tpu.gp.kernels.kernel_fn import KernelFn
from muygpys_tpu.ops import shear as _shear


class ShearKernel(KernelFn):
    """3-in/3-out lensing covariance (kappa, gamma1, gamma2)."""

    def __init__(
        self,
        deformation: DifferenceIsotropy = None,
        _backend_fn: Callable = _shear.shear_33_fn,
    ):
        if deformation is None:
            deformation = DifferenceIsotropy(
                F2, length_scale=Parameter(1.0)
            )
        if not isinstance(deformation, DifferenceIsotropy):
            raise ValueError(
                "ShearKernel only supports the specialized difference "
                f"isotropic deformations, not {type(deformation)}"
            )
        self._kernel_fn = _backend_fn
        super().__init__(deformation=deformation)
        self._make()

    def _make(self):
        super()._make_base()

        def embedded_fn(diffs, *args, length_scale=None, **kwargs):
            if length_scale is None:
                length_scale = self.deformation.length_scale()
            return self._kernel_fn(
                diffs, *args, length_scale=length_scale, **kwargs
            )

        self._fn = embedded_fn

    def __call__(self, diffs, adjust: bool = True, **kwargs):
        if adjust and diffs.shape[-2] != diffs.shape[-3]:
            # crosswise difference tensor: insert a unitary prediction dim
            diffs = diffs[..., None, :]
        return self._fn(diffs, **kwargs)

    def Kout(self, **kwargs) -> jnp.ndarray:
        """(3, 3) prior covariance evaluated at zero differences."""
        return self.__call__(jnp.zeros((1, 1, 2)))

    def get_opt_params(
        self,
    ) -> Tuple[List[str], List[float], List[Tuple[float, float]]]:
        return super().get_opt_params()

    def get_opt_fn(self) -> Callable:
        return self.__call__


class ShearKernel2in3out(KernelFn):
    """Observe the two shear components, predict (kappa, gamma1, gamma2)."""

    def __init__(
        self,
        deformation: DifferenceIsotropy = None,
        _backend_Kin_fn: Callable = _shear.shear_Kin23_fn,
        _backend_Kcross_fn: Callable = _shear.shear_Kcross23_fn,
        _backend_Kout_fn: Callable = _shear.shear_33_fn,
    ):
        if deformation is None:
            deformation = DifferenceIsotropy(
                F2, length_scale=Parameter(1.0)
            )
        if not isinstance(deformation, DifferenceIsotropy):
            raise ValueError(
                "ShearKernel only supports the specialized difference "
                f"isotropic deformations, not {type(deformation)}"
            )
        self._kernel_in_fn = _backend_Kin_fn
        self._kernel_cross_fn = _backend_Kcross_fn
        self._kernel_out_fn = _backend_Kout_fn
        super().__init__(deformation=deformation)
        self._make()

    def _make(self):
        super()._make_base()

        def _with_ls(fn):
            def embedded(diffs, *args, length_scale=None, **kwargs):
                if length_scale is None:
                    length_scale = self.deformation.length_scale()
                return fn(diffs, *args, length_scale=length_scale, **kwargs)

            return embedded

        self._Kin_fn = _with_ls(self._kernel_in_fn)
        self._Kcross_fn = _with_ls(self._kernel_cross_fn)
        self._Kout_fn = _with_ls(self._kernel_out_fn)

    def __call__(
        self, diffs, adjust: bool = True, force_Kcross: bool = False, **kwargs
    ):
        if force_Kcross:
            return self._Kcross_fn(diffs, **kwargs)
        elif adjust and diffs.shape[-2] != diffs.shape[-3]:
            diffs = diffs[..., None, :]
            return self._Kcross_fn(diffs, **kwargs)
        return self._Kin_fn(diffs, **kwargs)

    def Kout(self, **kwargs) -> jnp.ndarray:
        return self._Kout_fn(jnp.zeros((1, 1, 2)))

    def get_opt_params(
        self,
    ) -> Tuple[List[str], List[float], List[Tuple[float, float]]]:
        return super().get_opt_params()

    def get_opt_fn(self) -> Callable:
        return self.__call__
