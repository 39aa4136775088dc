"""Noise (nugget) perturbations of in-neighborhood covariance tensors.

Parity surface of ``_src/gp/noise/{numpy,jax}.py``: ``_homoscedastic_perturb``
(numpy.py:9-27), ``_heteroscedastic_perturb`` (:56-67), ``_shear_perturb33``
(:30-53).  Functional-update style (no in-place mutation) so everything is
jit/grad-safe; XLA fuses the diagonal add into the neighboring ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def homoscedastic_perturb(Kin: jnp.ndarray, noise_variance) -> jnp.ndarray:
    """Add ``tau^2 I`` to each neighborhood covariance block.

    Supports ``(batch, nn, nn)`` and the flattened multivariate layout
    ``(batch, in, nn, in, nn)``.
    """
    if Kin.ndim == 3:
        nn_count = Kin.shape[-1]
        eye = jnp.eye(nn_count, dtype=Kin.dtype)
        return Kin + noise_variance * eye
    elif Kin.ndim == 5:
        b, in_count, nn_count, in2, nn2 = Kin.shape
        assert in_count == in2 and nn_count == nn2
        all_count = in_count * nn_count
        Kin_flat = Kin.reshape(b, all_count, all_count)
        Kin_flat = Kin_flat + noise_variance * jnp.eye(
            all_count, dtype=Kin.dtype
        )
        return Kin_flat.reshape(b, in_count, nn_count, in_count, nn_count)
    raise ValueError(
        f"homoscedastic perturbation not implemented for shape {Kin.shape}"
    )


def heteroscedastic_perturb(
    Kin: jnp.ndarray, noise_variances: jnp.ndarray
) -> jnp.ndarray:
    """Add per-neighbor diagonal noise: ``Kin[b] += diag(noise[b])``."""
    nn_count = Kin.shape[-1]
    eye = jnp.eye(nn_count, dtype=Kin.dtype)
    return Kin + noise_variances[..., :, None] * eye


def shear_perturb33(Kin: jnp.ndarray, noise_variance) -> jnp.ndarray:
    """Lensing-specific nugget: doubled variance on the convergence block.

    ``Kin`` has shape ``(batch, 3, nn, 3, nn)``; the first of the three output
    blocks (convergence) receives ``2 tau^2``, the two shear blocks ``tau^2``.
    """
    if Kin.ndim != 5 or Kin.shape[1] != 3 or Kin.shape[3] != 3:
        raise ValueError(
            f"shear perturbation requires (b, 3, nn, 3, nn), got {Kin.shape}"
        )
    b, in_count, nn_count, _, _ = Kin.shape
    all_count = in_count * nn_count
    diag = jnp.concatenate(
        [
            2.0 * noise_variance * jnp.ones((nn_count,), Kin.dtype),
            noise_variance * jnp.ones((2 * nn_count,), Kin.dtype),
        ]
    )
    Kin_flat = Kin.reshape(b, all_count, all_count) + jnp.diag(diag)
    return Kin_flat.reshape(b, in_count, nn_count, in_count, nn_count)
