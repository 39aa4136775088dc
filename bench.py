"""Headline benchmark: posterior predictions/sec on one chip.

Times the batched nearest-neighborhood kernel+solve serve path — distance
tensors -> Matern kernel -> nugget -> one batched Cholesky -> posterior mean
and variance — the hot loop identified in SURVEY.md §3.2/§3.3.

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

    from muygpys_tpu.ops import kernels as k
    from muygpys_tpu.ops import noise as noise_ops
    from muygpys_tpu.ops import solve

    batch, nn = 8192, 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # realistic distance tensors from 1D neighborhoods
    pts = np.sort(rng.uniform(size=(batch, nn)), axis=1)
    pairwise = np.abs(pts[:, :, None] - pts[:, None, :])
    crosswise = np.abs(rng.uniform(size=(batch, 1)) - pts)
    targets = rng.standard_normal((batch, nn, 1))

    cw = jnp.asarray(crosswise, dtype)
    pw = jnp.asarray(pairwise, dtype)
    y = jnp.asarray(targets, dtype)

    @jax.jit
    def predict(cw, pw, y):
        Kin = noise_ops.homoscedastic_perturb(
            k.matern_15_fn(pw / 0.5), 1e-3
        )
        Kcross = k.matern_15_fn(cw / 0.5)
        return solve.serve_mean_and_variance(
            Kin, Kcross, jnp.ones((), dtype), y
        )

    # warm-up/compile
    mean, var = predict(cw, pw, y)
    jax.block_until_ready((mean, var))

    # steady state: best of 3 repetitions (the remote-compile tunnel adds
    # run-to-run jitter)
    iters = 50
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(cw, pw, y)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)

    preds_per_sec = batch * iters / best_dt
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
