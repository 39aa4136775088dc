"""On-chip decomposition of the fused serving chain (PERF.md r3).

Measures cumulative per-stage cost of the end-to-end serve path at the
bench.py configuration (50k train, 8192 queries, d=2, nn=30, +8 over-fetch):

  A. Pallas packed-key candidate kernel only (pallas_call, no merge)
  B. + approx_min_k merge + algebraic decode   (= knn_pallas)
  C. + ONE packed-table row gather             (rows = table[cand])
  D. + exact re-rank (top_k over C, take_along_axis)
  E. + transposes + fused coords solve         (= full chain, bench.py e2e)

Honest in-loop protocol (muygpys_tpu/performance/headline.py): N-iteration
jitted fori_loop minus 1-iteration program, inputs perturbed per iteration,
synced by materializing a scalar.

Run on the real chip:
  env PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_serve_chain.py
"""

import functools
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from muygpys_tpu.performance import headline as h  # noqa: E402


def stage_loop(iters, stage: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from muygpys_tpu.pallas import knn as pk
    from muygpys_tpu.pallas.fused_predict import fused_predict_coords_bl

    NN, D = h.NN, h.D_FEAT
    C = NN + 8
    params = jnp.asarray([h.LENGTH_SCALE] * D + [h.NOISE], jnp.float32)

    def kernel_only(train, queries):
        """The pallas_call of knn_pallas without merge/decode (stage A)."""
        bins, query_tile, train_tile = 512, 128, 2048
        query_count, feat = queries.shape
        train_count = train.shape[0]
        nt = math.ceil(train_count / train_tile)
        t_padded = nt * train_tile
        total_chunks = t_padded // bins
        chunk_bits = max(1, math.ceil(math.log2(total_chunks)))
        chunk_mask = (1 << chunk_bits) - 1
        train_pad = jnp.pad(
            train.astype(jnp.float32), ((0, t_padded - train_count), (0, 0))
        )
        tsq = jnp.sum(train_pad * train_pad, axis=-1)
        tsq = jnp.where(
            jnp.arange(t_padded) < train_count, tsq, jnp.float32(1e30)
        )
        nq = math.ceil(query_count / query_tile)
        q_pad = jnp.pad(
            queries.astype(jnp.float32),
            ((0, nq * query_tile - query_count), (0, 0)),
        )
        kernel = functools.partial(pk._knn_body, bins, chunk_mask)
        return pl.pallas_call(
            kernel,
            grid=(nq, nt),
            in_specs=[
                pl.BlockSpec((query_tile, feat), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((feat, train_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, train_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((query_tile, bins), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(2)
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nq * query_tile, bins), jnp.int32),
                jax.ShapeDtypeStruct((nq * query_tile, bins), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q_pad, train_pad.T, tsq[None, :])

    def predict(train, targets, queries):
        if stage == "A":
            s1, s2 = kernel_only(train, queries)
            return (jnp.sum(s1) + jnp.sum(s2)).astype(jnp.float32) * 1e-12
        cand, d2c = pk.knn_pallas(train, queries, C)
        if stage == "B":
            return jnp.sum(jnp.where(jnp.isfinite(d2c), d2c, 0.0)) + (
                jnp.sum(cand).astype(jnp.float32) * 0.0
            )
        table = jnp.concatenate([train, targets], axis=1)
        rows = table[cand]  # (B, C, d+r)
        if stage == "C":
            return jnp.sum(rows) * 1e-6
        xc = rows[:, :, :D]
        d2 = jnp.sum((xc - queries[:, None, :]) ** 2, -1)
        _, sel = jax.lax.top_k(-d2, NN)
        rows_k = jnp.take_along_axis(rows, sel[:, :, None], axis=1)
        if stage == "D":
            return jnp.sum(rows_k) * 1e-6
        nf = jnp.transpose(rows_k[:, :, :D], (1, 2, 0))
        y = jnp.transpose(rows_k[:, :, D:], (1, 2, 0))
        mean, var = fused_predict_coords_bl(
            nf, queries.T, y, params,
            smoothness=h.SMOOTHNESS, batch_tile=h.BATCH_TILE,
        )
        return jnp.sum(mean) + jnp.sum(var)

    return h._loop(predict, iters, perturb_arg=2)


def main():
    stages = sys.argv[1] if len(sys.argv) > 1 else "ABCDE"
    h.enable_persistent_cache(REPO)
    inputs = h.make_serve_inputs()
    results = {}
    prev = 0.0
    for stage in stages:
        t = h.measure(functools.partial(stage_loop, stage=stage), inputs)
        results[stage] = t
        print(
            f"stage {stage}: {t * 1e3:8.3f} ms/batch  "
            f"(+{(t - prev) * 1e3:7.3f} ms)  "
            f"{h.BATCH / t / 1e3:8.1f}k preds/s",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
