"""Vector hyperparameters (e.g. anisotropic per-dimension length scales).

API parity: reference ``gp/hyperparameter/vector.py`` (``VectorParameter``
:19, ``NamedVectorParameter`` :76).  Elements are named ``<name>0``,
``<name>1``, ... so they appear as separate scalar knobs on the optimization
surface, matching the reference's kwarg protocol, while ``__call__`` stacks
them into a JAX array for vectorized deformation math.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp

from muygpys_tpu.gp.hyperparameter.scalar import NamedParameter, Parameter


class VectorParameter:
    """A vector of individually configured scalar ``Parameter``s."""

    def __init__(self, *args: Parameter):
        self._params = list(args)

    def __len__(self) -> int:
        return len(self._params)

    def __getitem__(self, i: int) -> Parameter:
        return self._params[i]

    def __str__(self) -> str:
        inner = ", ".join(p.__str__() for p in self._params)
        return f"{type(self).__name__}({inner})"

    def __call__(self, **kwargs) -> jnp.ndarray:
        return jnp.array([p() for p in self._params])

    def fixed(self) -> bool:
        return all(p.fixed() for p in self._params)


class NamedVectorParameter(VectorParameter):
    """Vector parameter whose elements own names ``<name>0..<name>{d-1}``."""

    def __init__(self, name: str, param: VectorParameter):
        self._params = [
            NamedParameter(name + str(i), p)
            for i, p in enumerate(param._params)
        ]
        self._name = name

    def name(self) -> str:
        return self._name

    def set_defaults(self, **params) -> Dict:
        for p in self._params:
            params.setdefault(p.name(), p())
        return params

    def filter_kwargs(self, **kwargs) -> Tuple[Dict, Dict]:
        params = {
            k: v for k, v in kwargs.items() if k.startswith(self._name)
        }
        rest = {
            k: v for k, v in kwargs.items() if not k.startswith(self._name)
        }
        return self.set_defaults(**params), rest

    def __call__(self, **kwargs) -> jnp.ndarray:
        params, _ = self.filter_kwargs(**kwargs)
        return jnp.array([params[p.name()] for p in self._params])

    def apply_fn(self, fn: Callable) -> Callable:
        def applied_fn(*args, **kwargs):
            params, kwargs = self.filter_kwargs(**kwargs)
            return fn(*args, **params, **kwargs)

        return applied_fn

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
        for p in self._params:
            p.append_lists(names, params, bounds)

    def populate(self, hyperparameters: Dict) -> None:
        for p in self._params:
            hyperparameters[p.name()] = p
