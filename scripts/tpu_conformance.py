"""On-TPU f32 conformance measurement vs the f64 host oracle.

BASELINE.md demands posterior moments <= 1e-5 vs the reference numpy (f64)
path; the reference itself documents f32/f64 solve drift up to 1e-2
(reference README.md:162-172).  This script measures what the SHIPPED f32
serve paths actually deliver on the real chip, at tutorial scale
(nn=30, unit-range features, Matern 3/2), across a conditioning sweep
(the nugget sets the condition number ceiling: kappa <~ 1/noise for a
unit-diagonal kernel):

- XLA lanes path (ops.lanes_solver.serve_mean_and_variance_bl)
- Pallas coords kernel (pallas.fused_predict.fused_predict_coords_bl)

Prints one JSON line per (path, noise) with max-abs and RMS errors of mean
and variance vs a float64 oracle computed on host.  Run on hardware:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_conformance.py
"""

import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def oracle_f64(nf, q, y, ls, noise):
    """Posterior mean/variance in float64 numpy (the reference math)."""
    n, d, B = nf.shape
    nf = nf.astype(np.float64)
    q = q.astype(np.float64)
    y = y.astype(np.float64)
    means = np.zeros((y.shape[1], B))
    variances = np.zeros(B)
    for b in range(B):
        X = nf[:, :, b]  # (n, d)
        diff = X[:, None, :] - X[None, :, :]
        pw = np.sqrt((diff**2).sum(-1)) / ls
        cw = np.sqrt(((X - q[:, b][None, :]) ** 2).sum(-1)) / ls

        def matern15(u):
            t = np.sqrt(3.0) * u
            return (1.0 + t) * np.exp(-t)

        Kin = matern15(pw) + noise * np.eye(n)
        kc = matern15(cw)
        sol = np.linalg.solve(Kin, np.concatenate([kc[:, None], y[:, :, b]],
                                                  axis=1))
        means[:, b] = kc @ sol[:, 1:]
        variances[b] = 1.0 - kc @ sol[:, 0]
    return means, variances


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO_ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from muygpys_tpu.ops import kernels as k
    from muygpys_tpu.ops.lanes_solver import serve_mean_and_variance_bl
    from muygpys_tpu.pallas.fused_predict import fused_predict_coords_bl

    rng = np.random.default_rng(0)
    n, d, B = 30, 2, 512
    ls = 0.5
    nf = rng.uniform(size=(n, d, B)).astype(np.float32)
    q = rng.uniform(size=(d, B)).astype(np.float32)
    y = rng.standard_normal((n, 1, B)).astype(np.float32)

    backend = jax.default_backend()
    for noise in (1e-1, 1e-2, 1e-3, 1e-5):
        m64, v64 = oracle_f64(nf, q, y, ls, noise)

        # lanes (XLA) path
        nfs = jnp.asarray(nf) / ls
        qs = jnp.asarray(q) / ls
        d2p = jnp.sum(
            (nfs[:, None, :, :] - nfs[None, :, :, :]) ** 2, axis=2
        )
        d2c = jnp.sum((nfs - qs[None]) ** 2, axis=1)
        Kin = k.matern_15_fn(jnp.sqrt(d2p)) + noise * jnp.eye(
            n, dtype=jnp.float32
        )[:, :, None]
        kc = k.matern_15_fn(jnp.sqrt(d2c))
        m_l, v_l = serve_mean_and_variance_bl(
            Kin, kc, jnp.asarray(1.0, jnp.float32), jnp.asarray(y)
        )
        # pallas coords kernel
        m_p, v_p = fused_predict_coords_bl(
            jnp.asarray(nf), jnp.asarray(q), jnp.asarray(y),
            jnp.asarray([ls, ls, noise], jnp.float32),
            smoothness=1.5, batch_tile=512,
        )
        for name, m, v in (("lanes", m_l, v_l), ("pallas", m_p, v_p)):
            em = np.abs(np.asarray(m, np.float64) - m64)
            ev = np.abs(np.asarray(v, np.float64) - v64)
            print(json.dumps({
                "backend": backend,
                "path": name,
                "noise": noise,
                "mean_max_abs_err": float(em.max()),
                "mean_rms_err": float(np.sqrt((em**2).mean())),
                "var_max_abs_err": float(ev.max()),
                "var_rms_err": float(np.sqrt((ev**2).mean())),
            }), flush=True)


if __name__ == "__main__":
    main()
