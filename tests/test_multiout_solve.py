"""Fused multi-output (shear-block) Pallas solve conformance.

The (I*n, I*n) augmented VMEM elimination of pallas/multiout_solve.py
must reproduce the XLA batch-on-lanes block solver
(ops/lanes_solver.serve_mean_and_variance_multiout_bl) to roundoff —
posterior mean AND the full (o, o) covariance — across block sizes and
batch-tile geometries (r4 VERDICT next #5; reference shear family:
gp/kernels/experimental/shear.py:60-265).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muygpys_tpu.ops.lanes_solver import multiout_serve_mean_and_variance
from muygpys_tpu.pallas.multiout_solve import (
    fused_multiout_solve_bl,
    multiout_serve_pallas,
    multiout_tile_cap,
)


def _blocks(rng, B, I, n, O):
    m = I * n
    A = rng.standard_normal((B, m, 2 * m))
    Kin = (A @ A.transpose(0, 2, 1) / (2 * m) + 0.5 * np.eye(m)).reshape(
        B, I, n, I, n
    )
    Kc = rng.standard_normal((B, I, n, O))
    y = rng.standard_normal((B, I, n))
    Kout = np.eye(O) * 1.3 + 0.1
    return Kin, Kc, Kout, y


@pytest.mark.parametrize(
    "I,n,O,B",
    [
        (3, 8, 3, 12),  # shear-33-shaped block (conformance is size-free)
        pytest.param(2, 7, 3, 24, marks=pytest.mark.slow),
        pytest.param(1, 12, 1, 32, marks=pytest.mark.slow),
    ],
)
def test_matches_lanes_solver(rng, I, n, O, B):
    Kin, Kc, Kout, y = _blocks(rng, B, I, n, O)
    m1, c1 = multiout_serve_mean_and_variance(
        jnp.asarray(Kin), jnp.asarray(Kc), jnp.asarray(Kout), jnp.asarray(y)
    )
    m2, c2 = multiout_serve_pallas(
        jnp.asarray(Kin), jnp.asarray(Kc), jnp.asarray(Kout),
        jnp.asarray(y), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-10, atol=1e-12)


def test_uneven_batch_tile(rng):
    """B not divisible by the VMEM cap falls to a dividing power of two."""
    Kin, Kc, Kout, y = _blocks(rng, 24, 3, 8, 3)
    m = 24
    Kin_bl = jnp.transpose(jnp.asarray(Kin).reshape(24, m, m), (1, 2, 0))
    Kc_bl = jnp.transpose(jnp.asarray(Kc).reshape(24, m, 3), (1, 2, 0))
    y_bl = jnp.transpose(jnp.asarray(y).reshape(24, m), (1, 0))
    mean, cov = fused_multiout_solve_bl(
        Kin_bl, Kc_bl, jnp.asarray(Kout), y_bl, interpret=True
    )
    assert mean.shape == (3, 24) and cov.shape == (3, 3, 24)
    assert np.all(np.isfinite(np.asarray(mean)))


def test_tile_cap_vmem_budget():
    """Block + scratch residents stay under the 16M scoped budget."""
    for m in (30, 36, 90, 192):
        tb = multiout_tile_cap(m)
        resident = 8 * m * m * tb  # input block + scratch, f32
        assert resident <= 13 * 1024 * 1024, (m, tb, resident)
        assert tb >= 16, (m, tb)  # still a useful lane tile at shear sizes


def test_singular_block_stays_finite(rng):
    """Gill-Murray pivot floor (same contract as lanes cholesky_bl, r5
    review): a block with DUPLICATE neighbors is numerically singular —
    the fused solve must return finite posteriors on the whole batch
    tile, matching the lanes engine's surrogate-factor behavior."""
    Kin, Kc, Kout, y = _blocks(rng, 8, 3, 8, 3)
    # make block 3 singular: duplicate two observation rows exactly
    Kin = np.asarray(Kin)
    flat = Kin.reshape(8, 24, 24)
    flat[3, 5, :] = flat[3, 4, :]
    flat[3, :, 5] = flat[3, :, 4]
    Kin = flat.reshape(8, 3, 8, 3, 8)
    m1, c1 = multiout_serve_mean_and_variance(
        jnp.asarray(Kin), jnp.asarray(Kc), jnp.asarray(Kout), jnp.asarray(y)
    )
    m2, c2 = multiout_serve_pallas(
        jnp.asarray(Kin), jnp.asarray(Kc), jnp.asarray(Kout),
        jnp.asarray(y), interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(m2))) and np.all(
        np.isfinite(np.asarray(c2))
    )
    # the NON-singular lanes of the tile must still agree exactly
    ok = [b for b in range(8) if b != 3]
    np.testing.assert_allclose(
        np.asarray(m1)[ok], np.asarray(m2)[ok], rtol=1e-9, atol=1e-11
    )
