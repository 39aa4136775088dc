"""Measure KNN candidate-selection engines on the real chip.

Compares the XLA approx_min_k scan against the fused Pallas candidate
kernel (muygpys_tpu/pallas/knn.py) on the headline serve problem
(50k train points, 8192 queries, k=30+32 over-fetch + exact re-rank) and
on the million-scale configuration, with the honest in-loop protocol
(PERF.md).  Also prints fused-KNN end-to-end serve throughput.

Usage: PYTHONPATH=<repo> python scripts/measure_knn.py [million]
"""

import functools
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from muygpys_tpu.performance import headline as h  # noqa: E402


def main():
    h.enable_persistent_cache(REPO_ROOT)
    inputs = h.make_serve_inputs()

    for engine in ("xla", "pallas"):
        t0 = time.perf_counter()
        sec = h.measure(
            functools.partial(h.knn_loop, engine=engine), inputs
        )
        print(
            f"knn[{engine}] train={h.TRAIN_COUNT} q={h.BATCH} k={h.NN}: "
            f"{sec * 1e3:.3f} ms/batch = {h.BATCH / sec:,.0f} q/s "
            f"(total incl. compile {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    for engine in ("xla", "pallas"):
        t0 = time.perf_counter()
        sec = h.measure(
            functools.partial(
                h.end_to_end_loop, use_pallas=True, knn_engine=engine
            ),
            inputs,
        )
        print(
            f"e2e[knn={engine}] : {sec * 1e3:.3f} ms/batch = "
            f"{h.BATCH / sec:,.0f} preds/s "
            f"(total incl. compile {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    if "million" in sys.argv[1:]:
        import jax.numpy as jnp
        import numpy as np

        from muygpys_tpu.neighbors import (
            _brute_force_knn_scan,
            _refine_knn,
        )
        from muygpys_tpu.pallas.knn import knn_pallas

        rng = np.random.default_rng(7)
        train = jnp.asarray(
            rng.uniform(size=(1_000_000, 2)), jnp.float32
        )
        queries = jnp.asarray(rng.uniform(size=(4096, 2)), jnp.float32)

        def one(fn, label):
            idx, _ = fn(train, queries, 82)
            idx, d2 = _refine_knn(train, queries, idx, 50)
            t0 = time.perf_counter()
            for _ in range(3):
                idx, _ = fn(train, queries, 82)
                idx, d2 = _refine_knn(train, queries, idx, 50)
                float(np.asarray(d2).sum())
            dt = (time.perf_counter() - t0) / 3
            print(
                f"million[{label}]: {dt * 1e3:.1f} ms / 4096 q "
                f"= {4096 / dt:,.0f} q/s",
                flush=True,
            )

        one(_brute_force_knn_scan, "xla")
        one(knn_pallas, "pallas")


if __name__ == "__main__":
    main()
