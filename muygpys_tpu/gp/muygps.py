"""The MuyGPS model: local kriging GP via nearest-neighbor conditioning.

API parity: reference ``gp/muygps.py:28`` (methods: ``posterior_mean`` :164,
``posterior_variance`` :213, ``fast_coefficients`` :261,
``fast_posterior_mean`` :300, ``get_opt_mean_fn``/``get_opt_var_fn``
:343-371, ``optimize_scale`` :373, ``make_predict_tensors`` :405,
``make_train_tensors`` :477, ``fixed`` :128, ``get_opt_params`` :145,
``__eq__`` :553).

TPU deltas:
- tensor factories produce device arrays and everything downstream is
  jit-compatible; no ``@mpi_chunk`` scatter — sharding happens by placing the
  batch dim on a device mesh (:mod:`muygpys_tpu.parallel`);
- the composed mean/variance functors run batched Cholesky solves.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp

from muygpys_tpu.gp.fast_mean import FastPosteriorMean
from muygpys_tpu.gp.fast_precompute import FastPrecomputeCoefficients
from muygpys_tpu.gp.hyperparameter import FixedScale, ScaleFn
from muygpys_tpu.gp.kernels import KernelFn
from muygpys_tpu.gp.mean import PosteriorMean
from muygpys_tpu.gp.noise import HomoscedasticNoise, NoiseFn
from muygpys_tpu.gp.variance import PosteriorVariance
from muygpys_tpu.ops import solve as _solve


class MuyGPS:
    """Local kriging GP model conditioning on nearest neighborhoods.

    Computes, per batch element i with neighborhood N_i:
    - posterior mean ``mu_i = Kcross_i (Kin_i + eps)^{-1} Y_{N_i}``
    - posterior variance
      ``sigma_i = sigma^2 (Kout - Kcross_i (Kin_i + eps)^{-1} Kcross_i^T)``.
    """

    def __init__(
        self,
        kernel: KernelFn,
        noise: Optional[NoiseFn] = None,
        scale: Optional[ScaleFn] = None,
        _backend_mean_fn: Callable = _solve.posterior_mean,
        _backend_var_fn: Callable = _solve.diagonal_variance,
        _backend_fast_mean_fn: Callable = _solve.fast_posterior_mean,
        _backend_fast_precompute_fn: Callable = (
            _solve.fast_posterior_mean_precompute
        ),
    ):
        self.kernel = kernel
        self.noise = noise if noise is not None else HomoscedasticNoise(0.0)
        self.scale = scale if scale is not None else FixedScale()
        self._backend_mean_fn = _backend_mean_fn
        self._backend_var_fn = _backend_var_fn
        self._backend_fast_mean_fn = _backend_fast_mean_fn
        self._backend_fast_precompute_fn = _backend_fast_precompute_fn
        self._make()

    def _make(self) -> None:
        """Re-bake the composed prediction closures after parameter updates."""
        self.kernel._make()
        self._mean_fn = PosteriorMean(
            self.noise, _backend_fn=self._backend_mean_fn
        )
        self._var_fn = PosteriorVariance(
            self.kernel.Kout(),
            self.noise,
            self.scale,
            _backend_fn=self._backend_var_fn,
        )
        self._fast_posterior_mean_fn = FastPosteriorMean(
            _backend_fn=self._backend_fast_mean_fn
        )
        self._fast_precompute_fn = FastPrecomputeCoefficients(
            self.noise, _backend_fn=self._backend_fast_precompute_fn
        )

    def fixed(self) -> bool:
        """True iff no parameter requires optimization."""
        for p in self.kernel._hyperparameters.values():
            if not p.fixed():
                return False
        return self.noise.fixed()

    def get_opt_params(
        self,
    ) -> Tuple[List[str], jnp.ndarray, jnp.ndarray]:
        """Unfixed hyperparameter names, values, and bounds."""
        names, params, bounds = self.kernel.get_opt_params()
        self.noise.append_lists(names, params, bounds)
        return names, jnp.array(params), jnp.array(bounds)

    # --- prediction ---

    def posterior_mean(
        self, Kin, Kcross, batch_nn_targets, **kwargs
    ) -> jnp.ndarray:
        return self._mean_fn(Kin, Kcross, batch_nn_targets, **kwargs)

    def posterior_variance(self, Kin, Kcross, **kwargs) -> jnp.ndarray:
        return self._var_fn(Kin, Kcross, **kwargs)

    def posterior_mean_and_variance(
        self, Kin, Kcross, batch_nn_targets, **kwargs
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused mean + scaled variance from ONE batched solve (serve path).

        Faster than calling :meth:`posterior_mean` and
        :meth:`posterior_variance` separately (which re-factorize Kin).
        Univariate / diagonal-multivariate layouts route through the
        single-solve LU path; multi-output block layouts (``Kin`` 5-d —
        the lensing shear family) route through the batch-on-lanes
        Cholesky, which tiles the small flattened blocks onto full-width
        vector ops (see :mod:`muygpys_tpu.ops.lanes_solver`).
        """
        perturbed = self.noise.perturb(Kin, **kwargs)
        if Kin.ndim == 5:
            from muygpys_tpu.ops.lanes_solver import (
                multiout_serve_mean_and_variance,
            )

            mean, var = multiout_serve_mean_and_variance(
                perturbed, Kcross, self.kernel.Kout(), batch_nn_targets
            )
        else:
            mean, var = _solve.serve_mean_and_variance(
                perturbed, Kcross, self.kernel.Kout(), batch_nn_targets
            )
        return mean, self.scale() * var

    def fast_coefficients(
        self, Kin, train_nn_targets_fast, **kwargs
    ) -> jnp.ndarray:
        """Offline ``C = (Kin + eps)^{-1} Y`` over self-inclusive nbrhds."""
        return self._fast_precompute_fn(Kin, train_nn_targets_fast, **kwargs)

    def fast_posterior_mean(self, Kcross, coeffs_tensor) -> jnp.ndarray:
        """Serve-time mean: one einsum against precomputed coefficients."""
        return self._fast_posterior_mean_fn(Kcross, coeffs_tensor)

    # --- optimization surface ---

    def get_opt_mean_fn(self) -> Callable:
        return self._mean_fn.get_opt_fn()

    def get_opt_var_fn(self) -> Callable:
        return self._var_fn.get_opt_fn()

    def optimize_scale(self, pairwise_diffs, nn_targets, **kwargs) -> "MuyGPS":
        """Set sigma^2 using the scale functor's optimization method.

        Hierarchical (nonstationary) kernels need ``batch_features=``
        forwarded to the kernel evaluation."""
        Kin = self.kernel(pairwise_diffs, **kwargs)
        opt_fn = self.scale.get_opt_fn(self)
        self.scale._set(opt_fn(Kin, nn_targets))
        self._make()
        return self

    # --- tensor factories (deformation decides distances vs differences) ---

    def make_predict_tensors(
        self,
        batch_indices,
        batch_nn_indices,
        test_features,
        train_features,
        train_targets,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(crosswise, pairwise, batch_nn_targets) for out-of-sample predict."""
        if test_features is None:
            test_features = train_features
        crosswise = self.kernel.deformation.crosswise_tensor(
            test_features, train_features, batch_indices, batch_nn_indices
        )
        pairwise = self.kernel.deformation.pairwise_tensor(
            train_features, batch_nn_indices
        )
        batch_nn_targets = jnp.asarray(train_targets)[batch_nn_indices]
        return crosswise, pairwise, batch_nn_targets

    def make_train_tensors(
        self,
        batch_indices,
        batch_nn_indices,
        train_features,
        train_targets,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(crosswise, pairwise, batch_targets, batch_nn_targets) for LOO."""
        crosswise = self.kernel.deformation.crosswise_tensor(
            train_features, train_features, batch_indices, batch_nn_indices
        )
        pairwise = self.kernel.deformation.pairwise_tensor(
            train_features, batch_nn_indices
        )
        train_targets = jnp.asarray(train_targets)
        batch_targets = train_targets[batch_indices]
        batch_nn_targets = train_targets[batch_nn_indices]
        return crosswise, pairwise, batch_targets, batch_nn_targets

    def __eq__(self, rhs) -> bool:
        if not isinstance(rhs, self.__class__):
            return False
        return all(
            (
                all(
                    self.kernel._hyperparameters[h]()
                    == rhs.kernel._hyperparameters[h]()
                    for h in self.kernel._hyperparameters
                ),
                self.noise() == rhs.noise(),
                self.scale() == rhs.scale(),
            )
        )
