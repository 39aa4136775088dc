"""Scalar hyperparameters.

API parity with the reference's ``gp/hyperparameter/scalar.py`` (``Parameter``
:29, ``NamedParameter`` :298), redesigned for JAX: values may be Python floats
*or* traced JAX scalars, so the same objects drive ``jit``/``grad`` training
loops.  The kwarg-threading surface (``apply_fn``/``apply_embedding_fn``) is
retained because a dict of named free parameters IS a JAX pytree — the
reference's closure-composition idiom maps directly onto ``jax.grad`` over
kwarg dicts.
"""

from __future__ import annotations

from numbers import Number
from typing import Callable, Dict, List, Tuple, Union

import numpy as np


class Parameter:
    """A scalar hyperparameter with optimization bounds.

    ``bounds`` is either ``"fixed"`` or an increasing ``(lower, upper)`` pair.
    ``val`` may be a number within bounds, or the strings ``"sample"`` /
    ``"log_sample"`` to draw uniformly (in linear/log space) from the bounds.
    """

    def __init__(
        self,
        val: Union[str, float],
        bounds: Union[str, Tuple[float, float]] = "fixed",
        _rng: Union[np.random.Generator, None] = None,
    ):
        self._set_bounds(bounds)
        self._set_val(val, _rng)

    def _set_bounds(self, bounds) -> None:
        if isinstance(bounds, str):
            if bounds != "fixed":
                raise ValueError(f"unknown bound option {bounds!r}")
            self._bounds = (0.0, 0.0)
            self._fixed = True
            return
        if not hasattr(bounds, "__iter__"):
            raise ValueError(f"bounds {bounds!r} is not iterable or 'fixed'")
        bounds = tuple(bounds)
        if len(bounds) != 2:
            raise ValueError(f"bounds must have length 2, got {len(bounds)}")
        for b in bounds:
            if not isinstance(b, Number):
                raise ValueError(f"non-numeric bound {b!r}")
        lo, hi = float(bounds[0]), float(bounds[1])
        if lo > hi:
            raise ValueError(f"lower bound {lo} exceeds upper bound {hi}")
        self._bounds = (lo, hi)
        self._fixed = False

    def _sample_val(self, val: str, rng=None) -> float:
        if self._fixed:
            raise ValueError(
                f"fixed bounds do not support string value ({val!r}) prompts"
            )
        rng = rng if rng is not None else np.random.default_rng()
        lo, hi = self._bounds
        if val == "sample":
            return float(rng.uniform(lo, hi))
        elif val == "log_sample":
            return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        raise ValueError(f"unsupported string hyperparameter value {val!r}")

    def _set_val(self, val, rng=None) -> None:
        if isinstance(val, str):
            val = self._sample_val(val, rng)
        if hasattr(val, "__len__"):
            raise ValueError(f"nonscalar hyperparameter value {val!r}")
        if isinstance(val, Number):
            val = float(val)
        if not self._fixed:
            lo, hi = self._bounds
            v = float(np.asarray(val))
            if v < lo - 1e-5:
                raise ValueError(
                    f"value {v} is lesser than the lower bound {lo}"
                )
            if v > hi + 1e-5:
                raise ValueError(
                    f"value {v} is greater than the upper bound {hi}"
                )
        self._val = val

    def _set(self, rhs: "Parameter") -> None:
        self._val = rhs._val
        self._bounds = rhs._bounds
        self._fixed = rhs._fixed

    def __call__(self, **kwargs):
        return self._val

    def __str__(self):
        bstring = "fixed" if self._fixed else self._bounds
        return f"{type(self).__name__}({self._val}, {bstring})"

    def get_bounds(self) -> Tuple[float, float]:
        return self._bounds

    def fixed(self) -> bool:
        return self._fixed


ScalarParam = Parameter


class NamedParameter(Parameter):
    """A named ``Parameter`` — the unit of the optimization surface.

    The name is the key under which optimizers pass proposed values; a dict of
    such values is a valid JAX pytree, so objectives assembled through
    ``apply_fn``/``apply_embedding_fn`` are directly ``jit``/``grad``-able.
    """

    def __init__(self, name: str, param: Parameter):
        self._set(param)
        self._name = name

    def name(self) -> str:
        return self._name

    def apply_fn(self, fn: Callable) -> Callable:
        def applied_fn(*args, **kwargs):
            kwargs.setdefault(self._name, self())
            return fn(*args, **kwargs)

        return applied_fn

    def filter_kwargs(self, **kwargs) -> Tuple[Dict, Dict]:
        params = {k: v for k, v in kwargs.items() if k == self._name}
        rest = {k: v for k, v in kwargs.items() if k != self._name}
        params.setdefault(self._name, self())
        return params, rest

    def apply_embedding_fn(
        self, fn: Callable, deformation_fn: Callable
    ) -> Callable:
        def embedded_fn(dists, *args, **kwargs):
            params, kwargs = self.filter_kwargs(**kwargs)
            return fn(deformation_fn(dists, **params), *args, **kwargs)

        return embedded_fn

    def append_lists(
        self,
        names: List[str],
        params: List[float],
        bounds: List[Tuple[float, float]],
    ) -> None:
        if not self.fixed():
            names.append(self._name)
            params.append(self())
            bounds.append(self.get_bounds())

    def populate(self, hyperparameters: Dict) -> None:
        hyperparameters[self._name] = self
