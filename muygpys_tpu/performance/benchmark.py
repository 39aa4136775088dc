"""Pipeline-stage benchmark harness.

Modernized equivalent of the reference's ``performance/benchmark.py``
(``BenchmarkPipeline`` :148-329, ``benchmark_fn`` :340-353 with one jit
warm-up call before timing): times each stage of the MuyGPs pipeline —
tensor assembly, kernel evaluation, posterior mean/variance, scale, losses,
and the fused objective — with jit warm-up and ``block_until_ready`` fencing,
and optionally captures a ``jax.profiler`` trace.
"""

from __future__ import annotations

import time
from contextlib import nullcontext
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def benchmark_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    **kwargs,
) -> float:
    """Steady-state seconds per call of (possibly jitted) ``fn``."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class BenchmarkPipeline:
    """Times every stage of a MuyGPs predict/objective pipeline.

    Args:
        muygps: the model to benchmark.
        batch_count / nn_count / feature_count / response_count: shapes.
        profile_dir: if set, wrap the run in ``jax.profiler.trace``.
    """

    def __init__(
        self,
        muygps,
        batch_count: int = 2048,
        nn_count: int = 30,
        feature_count: int = 4,
        response_count: int = 1,
        profile_dir: Optional[str] = None,
        seed: int = 0,
    ):
        self.muygps = muygps
        self.profile_dir = profile_dir
        rng = np.random.default_rng(seed)
        self.features = jnp.asarray(
            rng.uniform(size=(batch_count * 2, feature_count))
        )
        self.targets = jnp.asarray(
            rng.standard_normal((batch_count * 2, response_count))
        )
        self.batch_indices = np.arange(batch_count)
        self.nn_indices = rng.integers(
            batch_count, batch_count * 2, size=(batch_count, nn_count)
        )

    def run(self, iters: int = 10) -> Dict[str, float]:
        """Return seconds-per-call for each pipeline stage."""
        m = self.muygps
        ctx = (
            jax.profiler.trace(self.profile_dir)
            if self.profile_dir
            else nullcontext()
        )
        timings: Dict[str, float] = {}
        with ctx:
            deformation = m.kernel.deformation

            pairwise_fn = jax.jit(
                lambda f: deformation.pairwise_tensor(f, self.nn_indices)
            )
            crosswise_fn = jax.jit(
                lambda f: deformation.crosswise_tensor(
                    f, f, self.batch_indices, self.nn_indices
                )
            )
            timings["pairwise_tensor"] = benchmark_fn(
                pairwise_fn, self.features, iters=iters
            )
            timings["crosswise_tensor"] = benchmark_fn(
                crosswise_fn, self.features, iters=iters
            )

            pairwise = pairwise_fn(self.features)
            crosswise = crosswise_fn(self.features)
            kernel_fn = jax.jit(lambda d: m.kernel(d))
            timings["kernel_Kin"] = benchmark_fn(
                kernel_fn, pairwise, iters=iters
            )
            timings["kernel_Kcross"] = benchmark_fn(
                kernel_fn, crosswise, iters=iters
            )

            Kin = kernel_fn(pairwise)
            Kcross = kernel_fn(crosswise)
            nn_targets = self.targets[self.nn_indices]
            mean_fn = jax.jit(
                lambda a, b, y: m.posterior_mean(a, b, y)
            )
            var_fn = jax.jit(lambda a, b: m.posterior_variance(a, b))
            timings["posterior_mean"] = benchmark_fn(
                mean_fn, Kin, Kcross, nn_targets, iters=iters
            )
            timings["posterior_variance"] = benchmark_fn(
                var_fn, Kin, Kcross, iters=iters
            )

            scale_opt = m.scale.get_opt_fn(m)
            timings["scale_optim"] = benchmark_fn(
                jax.jit(scale_opt), Kin, nn_targets, iters=iters
            )

            from muygpys_tpu.optimize import L_BFGS_B_optimize, lool_fn

            batch_targets = self.targets[self.batch_indices]
            obj_fn = L_BFGS_B_optimize.make_obj_fn(
                m, batch_targets, nn_targets, crosswise, pairwise,
                loss_fn=lool_fn,
            )
            names, x0, _ = m.get_opt_params()
            if len(names):
                pdict = {n: float(x0[i]) for i, n in enumerate(names)}
                jit_obj = jax.jit(lambda p: obj_fn(**p))
                timings["lool_objective"] = benchmark_fn(
                    jit_obj, pdict, iters=iters
                )
                jit_grad = jax.jit(jax.grad(lambda p: obj_fn(**p)))
                timings["lool_objective_grad"] = benchmark_fn(
                    jit_grad, pdict, iters=iters
                )
        return timings
