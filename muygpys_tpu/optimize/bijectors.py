"""Unconstrained reparameterization of bounded hyperparameters.

The reference keeps parameters valid by L-BFGS-B *box bounds*
(``_src/optimize/chassis/numpy.py:57-81``) plus positivity checks at
construction (``gp/noise/homoscedastic.py:52-58``).  Gradient optimizers on
TPU want an unconstrained space instead (SURVEY.md §7 delta 2): every chassis
here optimizes ``z`` with ``theta = lo + (hi - lo) * sigmoid(z)``, so validity
(positivity, box membership) is *structural* — no per-step clipping, no host
round-trips, and Adam/L-BFGS line searches can never propose a negative
nugget.

The scaled-sigmoid box bijector behaves like a log-transform near the lower
bound (d theta / d z ∝ theta - lo) and saturates smoothly at both ends, which
is exactly the softplus/log conditioning the SURVEY prescribed for positive
scale-type parameters whose bounds span decades (noise in (1e-5, 1e-1), ...).

All functions take ``(lo, hi)`` arrays aligned with the free-parameter name
order from ``MuyGPS.get_opt_params()`` and are jit/grad-safe.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Keep the inverse away from the saturated tails: sigmoid(±18.4) ~ 1e-8 of
# the interval width, far tighter than any recovery tolerance.
_Z_CLIP = 18.420680743952367  # = logit(1 - 1e-8)


def forward(z, lo, hi):
    """Unconstrained ``z`` -> ``theta`` in the open box ``(lo, hi)``."""
    return lo + (hi - lo) * jax.nn.sigmoid(z)


def inverse(theta, lo, hi):
    """Box ``theta`` -> unconstrained ``z`` (clipped out of the tails)."""
    t = (jnp.asarray(theta) - lo) / (hi - lo)
    z = jnp.log(t) - jnp.log1p(-t)
    return jnp.clip(z, -_Z_CLIP, _Z_CLIP)


def inverse_np(theta, lo, hi) -> np.ndarray:
    """Numpy inverse for host-side chassis setup."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    t = np.clip((np.asarray(theta, float) - lo) / (hi - lo), 1e-12, 1 - 1e-12)
    return np.clip(np.log(t) - np.log1p(-t), -_Z_CLIP, _Z_CLIP)


def forward_np(z, lo, hi) -> np.ndarray:
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    s = 1.0 / (1.0 + np.exp(-np.asarray(z, float)))
    return lo + (hi - lo) * s


def dforward_dz_np(z, lo, hi) -> np.ndarray:
    """d theta / d z — the host-side chain-rule factor for engines that
    return analytic gradients in theta-space (the fused Pallas kernel)."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    s = 1.0 / (1.0 + np.exp(-np.asarray(z, float)))
    return (hi - lo) * s * (1.0 - s)


def make_param_bijector(
    names: Sequence[str], bounds
) -> Tuple[callable, callable]:
    """(to_theta, to_z) over name-keyed dicts for a free-parameter set.

    ``to_theta`` is jit/grad-safe (used inside objectives); ``to_z`` is the
    host-side initializer.
    """
    bounds = np.asarray(bounds, float)
    lo = {n: float(bounds[i, 0]) for i, n in enumerate(names)}
    hi = {n: float(bounds[i, 1]) for i, n in enumerate(names)}

    def to_theta(zdict: Dict) -> Dict:
        return {n: forward(z, lo[n], hi[n]) for n, z in zdict.items()}

    def to_z(tdict: Dict) -> Dict:
        return {
            n: float(inverse_np(t, lo[n], hi[n])) for n, t in tdict.items()
        }

    return to_theta, to_z
