"""Tensor-valued (always fixed) hyperparameters.

API parity: reference ``gp/hyperparameter/tensor.py:29`` (``TensorParam``).
Currently used for heteroscedastic measurement noise.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class TensorParam:
    """An array-valued hyperparameter.  Never optimized."""

    def __init__(self, val):
        self._set_val(val)

    def _set_val(self, val) -> None:
        if isinstance(val, str):
            raise ValueError("TensorParam does not support strings")
        if not isinstance(val, (jnp.ndarray, np.ndarray)):
            raise ValueError(
                f"non-array tensor hyperparameter type {type(val)} is not "
                "allowed"
            )
        self._val = jnp.asarray(val)

    def _set(self, val=None) -> None:
        if val is not None:
            self._set_val(val)

    def __call__(self) -> jnp.ndarray:
        return self._val

    def fixed(self) -> bool:
        return True

    def append_lists(self, names, params, bounds) -> None:
        """Tensor parameters are always fixed: never on the opt surface
        (reference ``gp/hyperparameter/tensor.py:108-116``)."""
        return None

    def get_bounds(self) -> Tuple[float, float]:
        raise NotImplementedError(
            "TensorParam does not support optimization bounds"
        )
