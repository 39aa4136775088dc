"""Measure shear-family TRAINING objective cost on the real chip.

Three programs, jit(value_and_grad) each, honest in-loop protocol
(per-iteration LENGTH-SCALE perturbation — the kernel -> factorization ->
loss -> grad chain re-runs every iteration; nothing hoists):

- ``generic``: the composed functor objective (separate mean/cov
  factorizations) — what shear training ran through r4.
- ``shear-batched``: optimize/shear_objective.py, one flattened
  ``(B, m, m)`` Cholesky shared by mean + covariance (the device
  trainer's layout).
- ``shear-lanes``: same objective through the batch-on-lanes block
  elimination.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_shear_train.py
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

BATCH = 256  # the lanes-layout REVERSE pass allocates a (m, m, B) fusion
# buffer; 512 lanes measured 17.69M > the 16M scoped VMEM limit
NN = 30
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from muygpys_tpu.gp import MuyGPS
    from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
    from muygpys_tpu.gp.hyperparameter import FixedScale, Parameter
    from muygpys_tpu.gp.kernels.experimental import ShearKernel
    from muygpys_tpu.gp.noise import ShearNoise33
    from muygpys_tpu.optimize import L_BFGS_B_optimize, mse_fn
    from muygpys_tpu.optimize.shear_objective import make_shear_loo_objective
    from muygpys_tpu.performance.headline import enable_persistent_cache

    enable_persistent_cache(REPO_ROOT)
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(20_000, 2)).astype(np.float32)
    targets = rng.standard_normal((20_000, 3)).astype(np.float32)
    ls = 0.05
    model = MuyGPS(
        kernel=ShearKernel(
            deformation=DifferenceIsotropy(
                F2, length_scale=Parameter(ls, (0.01, 0.5))
            )
        ),
        noise=ShearNoise33(1e-4, (1e-6, 1e-2)),
        scale=FixedScale(),
    )
    bi = rng.choice(20_000, BATCH, replace=False)
    d = np.linalg.norm(pts[bi][:, None] - pts[None], axis=-1)
    bni = np.argsort(d, axis=1)[:, 1 : NN + 1]
    pw = np.asarray(
        model.kernel.deformation.pairwise_tensor(jnp.asarray(pts), bni)
    )
    cw = np.asarray(
        model.kernel.deformation.crosswise_tensor(
            jnp.asarray(pts[bi]), jnp.asarray(pts), np.arange(BATCH), bni
        )
    )
    bt = jnp.asarray(targets[bi])
    bnt = jnp.asarray(targets[bni].swapaxes(-2, -1))
    pw = jnp.asarray(pw)
    cw = jnp.asarray(cw)

    generic = L_BFGS_B_optimize.make_obj_fn(
        model, bt, bnt, cw, pw, loss_fn=mse_fn
    )

    # the objective builders close over the tensors, so the per-iteration
    # perturbation rides the LENGTH SCALE instead: every iteration
    # evaluates the full kernel -> factorization -> loss -> grad chain at
    # a different ls — nothing is loop-invariant
    def measure(make_obj):
        def loop(iters):
            obj = make_obj()
            g = jax.value_and_grad(obj)

            @jax.jit
            def run(ls0):
                def body(i, acc):
                    v, gr = g(
                        {
                            "length_scale": ls0 * (1.0 + 1e-6 * i),
                            "noise": 2e-4,
                        }
                    )
                    return acc + v + gr["length_scale"]

                return lax.fori_loop(
                    0, iters, body, jnp.asarray(0.0, jnp.float32)
                )

            return run

        l1, lN = loop(1), loop(ITERS + 1)
        float(np.asarray(l1(0.06)))
        float(np.asarray(lN(0.06)))
        b1 = bN = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(l1(0.06)))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(lN(0.06)))
            bN = min(bN, time.perf_counter() - t0)
        return (bN - b1) / ITERS

    def obj_dict(obj):
        return lambda p: obj(**p)

    from muygpys_tpu.optimize import lool_fn

    generic_lool = L_BFGS_B_optimize.make_obj_fn(
        model, bt, bnt, cw, pw, loss_fn=lool_fn
    )
    print(
        f"shear TRAIN value+grad ({BATCH} batch x {NN} nbrs, "
        f"(3x{NN})^2 blocks):", flush=True,
    )
    t_generic_lool = measure(lambda: obj_dict(generic_lool))
    print(
        f"  generic lool (mean+cov: 2 factorizations): "
        f"{t_generic_lool*1e3:8.2f} ms/step", flush=True,
    )
    t_batched_lool = measure(
        lambda: make_shear_loo_objective(
            model, bt, bnt, cw, pw, loss="lool", layout="batched"
        )[0]
    )
    print(
        f"  shear-batched lool (ONE shared factorization): "
        f"{t_batched_lool*1e3:8.2f} ms/step "
        f"({t_generic_lool/t_batched_lool:.2f}x)", flush=True,
    )
    t_generic = measure(lambda: obj_dict(generic))
    print(
        f"  generic composed : {t_generic*1e3:8.2f} ms/step = "
        f"{1.0/t_generic:8.1f} steps/sec", flush=True,
    )
    t_batched = measure(
        lambda: make_shear_loo_objective(
            model, bt, bnt, cw, pw, loss="mse", layout="batched"
        )[0]
    )
    print(
        f"  shear-batched    : {t_batched*1e3:8.2f} ms/step = "
        f"{1.0/t_batched:8.1f} steps/sec "
        f"({t_generic/t_batched:.2f}x)", flush=True,
    )
    t_lanes = measure(
        lambda: make_shear_loo_objective(
            model, bt, bnt, cw, pw, loss="mse", layout="lanes"
        )[0]
    )
    print(
        f"  shear-lanes      : {t_lanes*1e3:8.2f} ms/step = "
        f"{1.0/t_lanes:8.1f} steps/sec "
        f"({t_generic/t_lanes:.2f}x)", flush=True,
    )


if __name__ == "__main__":
    main()
