"""Measure shear-family serving throughput on the real chip — BOTH engines.

FastServer shear chain: difference-tensor assembly -> shear covariance
blocks -> (3n, 3n) block Cholesky -> posterior mean + full (3, 3)
covariance.  Three programs, honest in-loop protocol (fori_loop with
per-iteration NEIGHBOR-coordinate perturbation so Kin cannot be hoisted,
1-iter program subtracted):

- ``assembly``: tensors + covariance blocks only (no solve) — the
  decomposition anchor: solve cost = full - assembly.
- ``lanes``: XLA batch-on-lanes block solver (r4 engine).
- ``pallas``: fused VMEM block solve (pallas/multiout_solve.py, r5).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_shear_serve.py
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

TRAIN = 50_000
BUCKET = 2048
NN = 30
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from muygpys_tpu.gp import MuyGPS
    from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
    from muygpys_tpu.gp.hyperparameter import FixedScale, Parameter
    from muygpys_tpu.gp.kernels.experimental import ShearKernel
    from muygpys_tpu.gp.noise import ShearNoise33
    from muygpys_tpu.neighbors import NN_Wrapper
    from muygpys_tpu.pallas.multiout_solve import multiout_serve_pallas
    from muygpys_tpu.performance.headline import enable_persistent_cache

    enable_persistent_cache(REPO_ROOT)
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(TRAIN, 2)).astype(np.float32)
    targets = rng.standard_normal((TRAIN, 3)).astype(np.float32)
    ls = 0.05
    model = MuyGPS(
        kernel=ShearKernel(
            deformation=DifferenceIsotropy(F2, length_scale=Parameter(ls))
        ),
        noise=ShearNoise33(1e-3 * 2.0 / ls**4),
        scale=FixedScale(),
    )
    nbrs = NN_Wrapper(pts, NN, nn_method="exact")
    queries = rng.uniform(size=(BUCKET, 2)).astype(np.float32)
    nn_idx, _ = nbrs.get_nns(queries)
    nn_idx = np.asarray(nn_idx)
    q = jnp.asarray(queries)
    # pre-gathered neighbor coords/targets: the per-iteration perturbation
    # must reach Kin (it depends only on the neighbor coordinates), or XLA
    # hoists the block assembly AND the factorization out of the timed
    # loop (r5 review finding — the r4 harness perturbed only the query,
    # which feeds Kcross alone, and under-measured the lanes engine)
    nf = jnp.asarray(pts[nn_idx])  # (B, nn, 2)
    nnt = jnp.asarray(np.swapaxes(targets[nn_idx], -2, -1))  # (B, 3, nn)

    kernel = model.kernel
    interp = jax.default_backend() == "cpu"

    def assemble(q, nf):
        pw = nf[:, :, None, :] - nf[:, None, :, :]  # (B, nn, nn, 2)
        cw = q[:, None, :] - nf  # (B, nn, 2)
        return kernel(pw), kernel(cw)

    def core_assembly(q, nf):
        Kin, Kcross = assemble(q, nf)
        return jnp.sum(Kin) + jnp.sum(Kcross)

    def core_lanes(q, nf):
        Kin, Kcross = assemble(q, nf)
        mean, cov = model.posterior_mean_and_variance(Kin, Kcross, nnt)
        return jnp.sum(mean) + jnp.sum(cov)

    def core_pallas(q, nf):
        Kin, Kcross = assemble(q, nf)
        mean, cov = multiout_serve_pallas(
            model.noise.perturb(Kin), Kcross, kernel.Kout(), nnt,
            interpret=interp,
        )
        cov = model.scale() * cov
        return jnp.sum(mean) + jnp.sum(cov)

    def measure(core):
        def loop(iters):
            @jax.jit
            def run(q, nf):
                def body(i, acc):
                    return acc + core(q, nf * (1.0 + 1e-9 * i))

                return lax.fori_loop(
                    0, iters, body, jnp.asarray(0.0, jnp.float32)
                )

            return run

        l1, lN = loop(1), loop(ITERS + 1)
        float(np.asarray(l1(q, nf)))
        float(np.asarray(lN(q, nf)))
        b1 = bN = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(l1(q, nf)))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(lN(q, nf)))
            bN = min(bN, time.perf_counter() - t0)
        return (bN - b1) / ITERS

    t_asm = measure(core_assembly)
    t_lanes = measure(core_lanes)
    t_pallas = measure(core_pallas)
    print(
        f"shear serve decomposition ({BUCKET} queries x {NN} nbrs, "
        f"(3x{NN})^2 blocks, 3 outputs):"
    )
    print(
        f"  assembly only        : {t_asm*1e3:7.2f} ms/batch"
    )
    for name, t in (("lanes", t_lanes), ("pallas", t_pallas)):
        print(
            f"  {name:21s}: {t*1e3:7.2f} ms/batch = "
            f"{BUCKET/t:,.0f} preds/sec/chip "
            f"(solve share {(t-t_asm)*1e3:.2f} ms)"
        )
    print(
        f"  pallas vs lanes: {t_lanes/t_pallas:.2f}x end-to-end, "
        f"{(t_lanes-t_asm)/max(t_pallas-t_asm,1e-9):.2f}x on the solve"
    )


if __name__ == "__main__":
    main()
