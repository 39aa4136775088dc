"""Posterior quality of FastServer(engine="fused", rerank=False) (PERF r3).

rerank=False serves on the Pallas KNN kernel's nn_count *candidate*
neighborhoods instead of exactly re-ranked neighbor sets.  This measures,
at the bench configuration (50k train, 8192 queries, d=2, nn=30) with
GP-correlated targets:

- neighbor-set agreement vs the exact engine;
- RMS / max posterior mean and variance deltas vs the exact-neighborhood
  serve, in units of the posterior signal itself.

Run on the real chip:
  env PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/measure_norerank_quality.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from muygpys_tpu.gp import MuyGPS
    from muygpys_tpu.gp.deformation import Isotropy, l2
    from muygpys_tpu.gp.hyperparameter import FixedScale, Parameter
    from muygpys_tpu.gp.kernels import Matern
    from muygpys_tpu.gp.noise import HomoscedasticNoise
    from muygpys_tpu.neighbors import NN_Wrapper
    from muygpys_tpu.performance import headline as h
    from muygpys_tpu.serve import FastServer

    rng = np.random.default_rng(11)
    train = rng.uniform(size=(h.TRAIN_COUNT, h.D_FEAT)).astype(np.float32)
    # smooth GP-like targets: a few random Fourier features of the inputs
    w = rng.standard_normal((h.D_FEAT, 32)) / h.LENGTH_SCALE
    b = rng.uniform(0, 2 * np.pi, 32)
    targets = (
        np.cos(train @ w + b) @ rng.standard_normal(32) / np.sqrt(32)
        + 0.03 * rng.standard_normal(h.TRAIN_COUNT)
    ).astype(np.float32)[:, None]
    queries = rng.uniform(size=(h.BATCH, h.D_FEAT)).astype(np.float32)

    model = MuyGPS(
        kernel=Matern(
            smoothness=Parameter(h.SMOOTHNESS),
            deformation=Isotropy(
                l2, length_scale=Parameter(h.LENGTH_SCALE)
            ),
        ),
        noise=HomoscedasticNoise(h.NOISE),
        scale=FixedScale(),
    )
    nbrs = NN_Wrapper(train, h.NN, nn_method="exact")

    exact = FastServer(
        model, nbrs, train, targets, bucket=h.BATCH, engine="pallas"
    )
    m_ex, v_ex = exact.predict(queries)

    approx = FastServer(
        model, nbrs, train, targets, bucket=h.BATCH, engine="fused",
        rerank=False,
    )
    m_ap, v_ap = approx.predict(queries)

    # neighbor agreement of the candidate sets
    from muygpys_tpu.pallas.knn import knn_pallas

    cand, _ = knn_pallas(
        jnp.asarray(train), jnp.asarray(queries), h.NN,
        bins=256, query_tile=256,  # the rerank=False serving geometry
    )
    idx_exact = nbrs.get_nns(queries)[0]
    agree = np.mean(
        [
            len(np.intersect1d(np.asarray(cand)[i], idx_exact[i])) / h.NN
            for i in range(0, h.BATCH, 16)
        ]
    )

    sig = float(np.std(m_ex))
    dm = np.abs(m_ap - m_ex)
    dv = np.abs(v_ap - v_ex)
    print(f"neighbor-set agreement (no over-fetch): {agree:.4f}")
    print(
        f"posterior mean delta: rms {float(np.sqrt(np.mean(dm**2)))/sig:.2e}"
        f" of signal rms, max {float(dm.max())/sig:.2e}"
    )
    print(
        f"posterior var  delta: rms "
        f"{float(np.sqrt(np.mean(dv**2)))/float(np.mean(v_ex)):.2e}"
        f" of mean var, max {float(dv.max())/float(np.mean(v_ex)):.2e}"
    )


if __name__ == "__main__":
    main()
