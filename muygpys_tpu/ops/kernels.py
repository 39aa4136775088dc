"""Scalar kernel functions (pure JAX, elementwise over distance tensors).

Parity surface of the reference backends ``_src/gp/kernels/{numpy,jax}.py``:
``_rbf_fn`` (jax.py:14-15), ``_matern_05/15/25/inf_fn`` (jax.py:19-37),
``_matern_gen_fn`` (jax.py:41-58).  Inputs follow the reference convention:
RBF consumes *squared* distances already scaled by 1/l^2; Matern consumes
plain distances already scaled by 1/l.

All are trivially fusable elementwise ops (VPU) that XLA folds into the
surrounding distance-assembly and solve graph.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from muygpys_tpu.ops.bessel import kve

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


def rbf_fn(squared_dists: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-squared_dists / 2.0)


def matern_05_fn(dists: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-dists)


def matern_15_fn(dists: jnp.ndarray) -> jnp.ndarray:
    K = dists * _SQRT3
    return (1.0 + K) * jnp.exp(-K)


def matern_25_fn(dists: jnp.ndarray) -> jnp.ndarray:
    K = dists * _SQRT5
    return (1.0 + K + K * K / 3.0) * jnp.exp(-K)


def matern_inf_fn(dists: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-(dists**2) / 2.0)


def matern_gen_fn(dists: jnp.ndarray, smoothness) -> jnp.ndarray:
    """General-order Matern:
    ``k(d) = 2^{1-v}/Gamma(v) (sqrt(2v) d)^v K_v(sqrt(2v) d)``, ``k(0)=1``.

    Computed through the exponentially scaled ``kve`` with the prefactor in
    log space for stability:
    ``k = exp((1-v) ln2 - lnGamma(v) + v ln t - t) * kve(v, t)``.
    """
    dtype = dists.dtype
    v = jnp.asarray(smoothness, dtype)
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
    zero = dists <= 0.0
    d_safe = jnp.where(zero, eps, dists)
    t = jnp.sqrt(2.0 * v) * d_safe
    log_pref = (1.0 - v) * jnp.log(jnp.asarray(2.0, dtype)) - gammaln(v)
    val = jnp.exp(log_pref + v * jnp.log(t) - t) * kve(v, t)
    return jnp.where(zero, jnp.ones_like(val), val)
