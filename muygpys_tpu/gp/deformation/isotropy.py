"""Isotropic deformations.

API parity: reference ``gp/deformation/isotropy.py`` (``Isotropy`` :22,
``DifferenceIsotropy`` :165).  TPU delta: ``Isotropy`` assembles *distances*
directly from indices through the metric's fused MXU path, never
materializing the per-feature difference tensor (the memory-lean layout the
reference also prefers, made bandwidth-optimal here).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from muygpys_tpu.gp.deformation.deformation_fn import DeformationFn
from muygpys_tpu.gp.deformation.metric import MetricFn
from muygpys_tpu.gp.hyperparameter import NamedParameter, Parameter


class Isotropy(DeformationFn):
    """Scalar-length-scale deformation over a distance tensor."""

    def __init__(self, metric: MetricFn, length_scale: Parameter):
        if isinstance(length_scale, Parameter):
            self.length_scale = NamedParameter("length_scale", length_scale)
        else:
            # hierarchical length scales attach here in the experimental path
            from muygpys_tpu.gp.hyperparameter.experimental import (
                HierarchicalParameter,
                NamedHierarchicalParameter,
            )

            if isinstance(length_scale, HierarchicalParameter):
                self.length_scale = NamedHierarchicalParameter(
                    "length_scale", length_scale
                )
            else:
                raise ValueError(
                    "expected Parameter type for length_scale, not "
                    f"{type(length_scale)}"
                )
        self.metric = metric

    def __call__(
        self,
        dists: jnp.ndarray,
        length_scale: Optional[Union[float, jnp.ndarray]] = None,
        **kwargs,
    ) -> jnp.ndarray:
        if length_scale is None:
            length_scale = self.length_scale(**kwargs)
        # hierarchical params produce a per-batch-element length scale vector
        if isinstance(length_scale, jnp.ndarray) and length_scale.ndim > 0:
            shape = [None] * dists.ndim
            shape[0] = slice(None)
            length_scale = length_scale[tuple(shape)]
        return self.metric.apply_length_scale(dists, length_scale)

    def pairwise_tensor(
        self, data: jnp.ndarray, nn_indices: jnp.ndarray, **kwargs
    ) -> jnp.ndarray:
        """Distances ``(batch, nn, nn)`` among each neighborhood."""
        return self.metric.pairwise_distances(data, nn_indices)

    def crosswise_tensor(
        self,
        data: jnp.ndarray,
        nn_data: jnp.ndarray,
        data_indices: jnp.ndarray,
        nn_indices: jnp.ndarray,
        **kwargs,
    ) -> jnp.ndarray:
        """Distances ``(batch, nn)`` between batch points and neighbors."""
        return self.metric.crosswise_distances(
            data, nn_data, data_indices, nn_indices
        )


class DifferenceIsotropy(Isotropy):
    """Isotropy over feature-wise *differences* (required by shear kernels,
    which need raw differences before the metric collapse)."""

    def __call__(
        self,
        dists: jnp.ndarray,
        length_scale: Optional[float] = None,
        **kwargs,
    ) -> jnp.ndarray:
        if length_scale is None:
            length_scale = self.length_scale(**kwargs)
        return self.metric(dists / length_scale)

    def pairwise_tensor(
        self, data: jnp.ndarray, nn_indices: jnp.ndarray, **kwargs
    ) -> jnp.ndarray:
        """Differences ``(batch, nn, nn, feat)`` among each neighborhood."""
        return self.metric.pairwise_differences(data, nn_indices)

    def crosswise_tensor(
        self,
        data: jnp.ndarray,
        nn_data: jnp.ndarray,
        data_indices: jnp.ndarray,
        nn_indices: jnp.ndarray,
        **kwargs,
    ) -> jnp.ndarray:
        """Differences ``(batch, nn, feat)``."""
        return self.metric.crosswise_differences(
            data, nn_data, data_indices, nn_indices
        )
