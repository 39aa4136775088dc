"""Anisotropic deformation (per-feature length scales).

API parity: reference ``gp/deformation/anisotropy.py:15``.
"""

from __future__ import annotations

import jax.numpy as jnp

from muygpys_tpu.gp.deformation.deformation_fn import DeformationFn
from muygpys_tpu.gp.deformation.metric import MetricFn
from muygpys_tpu.gp.hyperparameter import NamedVectorParameter, VectorParameter


class Anisotropy(DeformationFn):
    """Vector-length-scale deformation over feature-difference tensors."""

    def __init__(self, metric: MetricFn, length_scale: VectorParameter):
        self.metric = metric
        self.length_scale = NamedVectorParameter("length_scale", length_scale)

    def __call__(self, diffs: jnp.ndarray, **length_scales) -> jnp.ndarray:
        if diffs.shape[-1] != len(self.length_scale):
            raise ValueError(
                f"difference tensor of shape {diffs.shape} must have final "
                f"dimension size of {len(self.length_scale)}"
            )
        ls = self.length_scale(**length_scales)
        ls = jnp.asarray(ls, diffs.dtype)
        return self.metric(diffs / ls)

    def pairwise_tensor(
        self, data: jnp.ndarray, nn_indices: jnp.ndarray, **kwargs
    ) -> jnp.ndarray:
        """Differences ``(batch, nn, nn, feat)``; feature dim kept for
        per-dimension scaling at kernel-evaluation time."""
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
