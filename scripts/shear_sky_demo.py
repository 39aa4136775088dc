"""BASELINE config 5 end-to-end: weak-lensing shear on million-scale sky
points, batch sharded over the device mesh.

Pipeline (all on device):
  1. synthetic sky: ``n`` random positions, (convergence, shear1, shear2)
     targets from a smooth analytic field + noise
  2. exact KNN over the full sky (scan-tiled brute force,
     :mod:`muygpys_tpu.neighbors`)
  3. LOO optimization of the shear kernel length scale on a mesh-sharded
     batch (gradient-based L-BFGS-B)
  4. posterior mean+variance serve over a large sharded batch, timed

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/shear_sky_demo.py \
      [--n 1000000] [--serve 8192] [--nn 30]
  (CPU smoke: prefix with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
   XLA_FLAGS=--xla_force_host_platform_device_count=8 and use --n 20000)

Sharded-equals-serial correctness for this pipeline is asserted in
tests/test_distributed.py (sharded shear objective/gradient/posterior).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--serve", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--nn", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from muygpys_tpu.gp import MuyGPS
    from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
    from muygpys_tpu.gp.hyperparameter import FixedScale, Parameter
    from muygpys_tpu.gp.kernels.experimental import ShearKernel
    from muygpys_tpu.gp.noise import ShearNoise33
    from muygpys_tpu.neighbors import NN_Wrapper
    from muygpys_tpu.optimize import L_BFGS_B_optimize, mse_fn
    from muygpys_tpu.parallel import even_batch, make_mesh, shard_batch

    mesh = make_mesh()
    print(f"devices: {jax.device_count()}, sky points: {args.n}")

    # --- 1. synthetic sky --------------------------------------------------
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(args.n, 2)).astype(np.float32)
    # smooth multi-mode field standing in for a convergence map
    kx, ky = 2 * np.pi * np.array([3.0, 7.0]), 2 * np.pi * np.array([5.0, 2.0])
    phase = pts @ np.stack([kx, ky], axis=1)  # (n, 2)
    targets = np.stack(
        [
            np.sin(phase[:, 0]) + 0.5 * np.cos(phase[:, 1]),
            0.5 * np.cos(phase[:, 0]),
            0.5 * np.sin(phase[:, 1]),
        ],
        axis=1,
    ).astype(np.float32)
    targets += 0.02 * rng.standard_normal((args.n, 3)).astype(np.float32)

    # --- 2. million-scale exact KNN ----------------------------------------
    t0 = time.perf_counter()
    nbrs = NN_Wrapper(pts, args.nn, nn_method="exact")
    bc = even_batch(args.batch, mesh)
    bi = rng.choice(args.n, bc, replace=False)
    bni, _ = nbrs.get_batch_nns(bi)
    t_knn = time.perf_counter() - t0
    print(f"KNN build+batch query ({bc} x {args.nn}): {t_knn:.2f}s")

    # --- 3. sharded LOO optimization ---------------------------------------
    # the shear prior's diagonal is ~2/ls^4 (second derivatives of the RBF),
    # so an absolute 1e-4 nugget is below f32 epsilon relative to it and the
    # solve goes singular; pick the nugget relative to the prior diagonal
    ls0 = 0.05
    nugget = 1e-3 * 2.0 / ls0**4
    model = MuyGPS(
        kernel=ShearKernel(
            deformation=DifferenceIsotropy(
                F2, length_scale=Parameter(ls0, (0.005, 0.5))
            )
        ),
        noise=ShearNoise33(nugget),
        scale=FixedScale(),
    )
    pw = model.kernel.deformation.pairwise_tensor(jnp.asarray(pts), bni)
    cw = model.kernel.deformation.crosswise_tensor(
        jnp.asarray(pts), jnp.asarray(pts), bi, bni
    )
    bt = jnp.asarray(targets[bi])
    bnt = jnp.asarray(targets[np.asarray(bni)].swapaxes(-2, -1))
    cw_s, pw_s, bt_s, bnt_s = shard_batch((cw, pw, bt, bnt), mesh)

    t0 = time.perf_counter()
    model = L_BFGS_B_optimize(
        model, bt_s, bnt_s, cw_s, pw_s, loss_fn=mse_fn
    )
    t_opt = time.perf_counter() - t0
    ls = float(model.kernel.deformation.length_scale())
    print(f"LOO optimization (batch {bc} sharded): {t_opt:.2f}s, "
          f"length_scale={ls:.4f}")

    # --- 4. posterior serve -------------------------------------------------
    sc = even_batch(args.serve, mesh)
    si = rng.choice(args.n, sc, replace=False)
    nbrs.get_nns(pts[si])  # warm the query-shape executable
    t0 = time.perf_counter()
    sni, _ = nbrs.get_nns(pts[si])
    t_nn = time.perf_counter() - t0
    pw = model.kernel.deformation.pairwise_tensor(jnp.asarray(pts), sni)
    cw = model.kernel.deformation.crosswise_tensor(
        jnp.asarray(pts[si]), jnp.asarray(pts), np.arange(sc), sni
    )
    snt = jnp.asarray(targets[np.asarray(sni)].swapaxes(-2, -1))
    cw_s, pw_s, snt_s = shard_batch((cw, pw, snt), mesh)

    @jax.jit
    def predict(cw_, pw_, snt_):
        # one shared batch-on-lanes Cholesky for mean + full (3, 3)
        # posterior covariance (ops/lanes_solver.multiout_serve_...)
        Kin, Kcross = model.kernel(pw_), model.kernel(cw_)
        return model.posterior_mean_and_variance(Kin, Kcross, snt_)

    mean, var = predict(cw_s, pw_s, snt_s)  # compile
    mean = np.asarray(mean)
    t0 = time.perf_counter()
    mean, var = predict(cw_s, pw_s, snt_s)
    mean = np.asarray(mean)  # host-sync
    t_serve = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((mean - targets[si]) ** 2)))
    print(f"posterior serve {sc} points (3 outputs): KNN {t_nn*1e3:.1f}ms, "
          f"kernel+solve {t_serve*1e3:.1f}ms "
          f"({sc / t_serve:,.0f} pts/sec), rmse {rmse:.4f}")


if __name__ == "__main__":
    main()
