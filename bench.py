"""Headline benchmark: posterior predictions/sec on one chip.

Times the fused batched nearest-neighborhood serve path — Matern kernel ->
nugget -> batched Cholesky -> posterior mean and variance — in the
framework's lane-optimized batch-last layout
(:mod:`muygpys_tpu.ops.lanes_solver`; see PERF.md for the layout story).

Timing methodology (this environment's quirks make the usual idiom lie):
- ``jax.block_until_ready`` does NOT block through the axon relay, so every
  sample is synced by materializing a scalar on the host.
- Each executable round-trips the relay (~33 ms fixed), so iteration happens
  INSIDE one jitted program via ``lax.fori_loop`` (inputs perturbed per
  iteration to prevent loop-invariant hoisting); per-iteration time is the
  difference between an N-iteration and a 1-iteration program.

Baseline: the reference publishes no numbers (BASELINE.md); the driver's
north-star target is >= 1e6 predictions/sec on a v5e-8 (8 chips), i.e. a
125k/sec/chip share.  ``vs_baseline`` is measured value / 125000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from muygpys_tpu.ops import kernels as k
    from muygpys_tpu.ops.lanes_solver import serve_mean_and_variance_bl

    batch, nn = 8192, 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # realistic distance tensors from 1D neighborhoods, batch-last layout
    pts = np.sort(rng.uniform(size=(batch, nn)), axis=1)
    pairwise = np.abs(pts[:, :, None] - pts[:, None, :]).transpose(1, 2, 0)
    crosswise = np.abs(rng.uniform(size=(batch, 1)) - pts).T
    targets = rng.standard_normal((batch, nn, 1)).transpose(1, 2, 0)

    cw = jnp.asarray(crosswise, dtype)  # (nn, B)
    pw = jnp.asarray(pairwise, dtype)  # (nn, nn, B)
    y = jnp.asarray(targets, dtype)  # (nn, 1, B)
    eye_bl = jnp.eye(nn, dtype=dtype)[:, :, None]

    def predict(cw_, pw_, y_):
        Kin = k.matern_15_fn(pw_ / 0.5) + 1e-3 * eye_bl
        Kcross = k.matern_15_fn(cw_ / 0.5)
        mean, var = serve_mean_and_variance_bl(
            Kin, Kcross, jnp.asarray(1.0, dtype), y_
        )
        return jnp.sum(mean) + jnp.sum(var)

    def make_loop(iters):
        @jax.jit
        def loop(cw_, pw_, y_):
            # perturb pw per iteration: keeps kernel eval + Cholesky inside
            # the loop (a loop-invariant Kin would let XLA hoist the
            # factorization and overstate throughput)
            return lax.fori_loop(
                0,
                iters,
                lambda i, acc: acc + predict(
                    cw_, pw_ * (1.0 + 1e-9 * i), y_
                ),
                jnp.asarray(0.0, dtype),
            )

        return loop

    iters = 40
    loop1, loopN = make_loop(1), make_loop(iters + 1)
    # warm/compile (host-sync via scalar materialization)
    float(np.asarray(loop1(cw, pw, y)))
    float(np.asarray(loopN(cw, pw, y)))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop1(cw, pw, y)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(loopN(cw, pw, y)))
        tN = time.perf_counter() - t0
        best = min(best, (tN - t1) / iters)

    preds_per_sec = batch / best
    print(
        json.dumps(
            {
                "metric": "posterior_predictions_per_sec_per_chip",
                "value": round(preds_per_sec, 1),
                "unit": "predictions/sec",
                "vs_baseline": round(preds_per_sec / 125000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
