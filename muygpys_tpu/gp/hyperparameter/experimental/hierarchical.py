"""Hierarchical nonstationary hyperparameters: a GP over a hyperparameter.

API parity: reference ``gp/hyperparameter/experimental/hierarchical.py``
(``HierarchicalParameter`` :15, ``NamedHierarchicalParameter`` — knot solve +
crosswise projection :110-124, ``NamedHierarchicalVectorParameter`` :161-181,
``sample_knots`` Latin hypercube :184-198).

The parameter value at each batch point is the higher-level GP's posterior
mean over knot values: ``ls(x) = Kcross(x, knots) (K_knots + eps I)^{-1} v``.
Knot values are scalar free parameters on the optimization surface, so the
whole nonstationary field trains under jit+grad.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from muygpys_tpu.gp.hyperparameter import (
    NamedVectorParameter,
    VectorParameter,
)
from muygpys_tpu.gp.noise import HomoscedasticNoise


class HierarchicalParameter:
    """Knot-based nonstationary hyperparameter driven by a higher-level GP."""

    def __init__(
        self,
        knot_features,
        knot_params: VectorParameter,
        kernel,
        noise: HomoscedasticNoise = None,
    ):
        self._knot_count = len(knot_params)
        if self._knot_count != len(knot_features):
            raise ValueError(
                "knot_features and knot_values must have the same length"
            )
        self._knot_features = jnp.asarray(knot_features)
        self._knot_params = knot_params
        self._kernel = kernel
        self._Kin_higher = self._kernel(
            self._kernel.deformation.pairwise_tensor(
                self._knot_features,
                jnp.arange(self._knot_features.shape[0]),
            )
        )
        self._noise = noise if noise is not None else HomoscedasticNoise(1e-5)

    def __call__(self, batch_features, **kwargs):
        raise NotImplementedError(
            "__call__ not implemented for base HierarchicalParameter"
        )

    def fixed(self) -> bool:
        return self._knot_params.fixed()

    def get_bounds(self) -> Tuple[float, float]:
        raise NotImplementedError(
            "HierarchicalParameter does not support direct optimization "
            "bounds; set bounds on individual knot values instead"
        )


HierarchicalParam = HierarchicalParameter


class NamedHierarchicalParameter(HierarchicalParameter):
    def __init__(self, name: str, rhs: HierarchicalParameter):
        self._knot_count = rhs._knot_count
        self._knot_features = rhs._knot_features
        self._params = NamedVectorParameter(name, rhs._knot_params)
        self._Kin_higher = rhs._Kin_higher
        self._kernel = rhs._kernel
        self._noise = rhs._noise
        self._name = name

    def name(self) -> str:
        return self._name

    def knot_values(self) -> jnp.ndarray:
        return self._params()

    def __call__(self, batch_features, **kwargs):
        params, kwargs = self._params.filter_kwargs(**kwargs)
        solve = jnp.linalg.solve(
            self._Kin_higher
            + self._noise() * jnp.eye(self._knot_count),
            self._params(**params),
        )
        lower_Kcross = self._kernel(
            self._kernel.deformation.crosswise_tensor(
                batch_features,
                self._knot_features,
                jnp.arange(batch_features.shape[0]),
                jnp.arange(self._knot_features.shape[0]),
            )
        )
        raw = jnp.squeeze(lower_Kcross @ solve)
        # GP interpolation can overshoot below zero between knots (RBF
        # weights are signed), which would hand a negative length scale to
        # the lower-level kernel and NaN the loss.  A sharp softplus floors
        # the field at ~0 while matching the raw interpolant to <1e-4 for
        # values above ~0.3.  (The reference returns the raw interpolant and
        # inherits the NaN, hierarchical.py:110-124.)
        beta = 20.0
        return 1e-6 + jax.nn.softplus(beta * raw) / beta

    def filter_kwargs(self, **kwargs) -> Tuple[Dict, Dict]:
        params, kwargs = self._params.filter_kwargs(**kwargs)
        lower = {self._name: self(kwargs["batch_features"], **params)}
        return lower, kwargs

    def apply_fn(self, fn: Callable) -> Callable:
        def applied_fn(*args, **kwargs):
            lower, kwargs = self.filter_kwargs(**kwargs)
            return fn(*args, **lower, **kwargs)

        return applied_fn

    def apply_embedding_fn(
        self, fn: Callable, deformation_fn: Callable
    ) -> Callable:
        def embedded_fn(dists, *args, **kwargs):
            lower, kwargs = self.filter_kwargs(**kwargs)
            return fn(deformation_fn(dists, **lower), *args, **kwargs)

        return embedded_fn

    def append_lists(
        self,
        names: List[str],
        params: List[float],
        bounds: List[Tuple[float, float]],
    ) -> None:
        self._params.append_lists(names, params, bounds)

    def populate(self, hyperparameters: Dict) -> None:
        self._params.populate(hyperparameters)


class NamedHierarchicalVectorParameter(NamedVectorParameter):
    def __init__(self, name: str, param: VectorParameter):
        self._params = [
            NamedHierarchicalParameter(name + str(i), p)
            for i, p in enumerate(param._params)
        ]
        self._name = name

    def filter_kwargs(self, **kwargs) -> Tuple[Dict, Dict]:
        params = {
            k: v for k, v in kwargs.items() if k.startswith(self._name)
        }
        kwargs = {
            k: v for k, v in kwargs.items() if not k.startswith(self._name)
        }
        if "batch_features" in kwargs:
            for p in self._params:
                params.setdefault(
                    p.name(), p(kwargs["batch_features"], **params)
                )
        return params, kwargs


def sample_knots(feature_count: int, knot_count: int) -> jnp.ndarray:
    """Latin hypercube sample of knot locations in the unit cube."""
    from scipy.stats.qmc import LatinHypercube

    return jnp.asarray(
        LatinHypercube(feature_count, scramble=False).random(knot_count)
    )
