"""Headline benchmark: posterior predictions/sec on one chip.

Primary metric: the fused coordinate-streaming serve kernel
(:func:`muygpys_tpu.pallas.fused_predict.fused_predict_coords_bl`) — the
production FastServer path: distance assembly + Matern kernel + nugget +
batched Cholesky + posterior mean/variance in ONE VMEM pass, hyperparameters
traced (no per-model recompile).  Falls back to the lane-layout XLA program
(:mod:`muygpys_tpu.ops.lanes_solver`) if no Pallas executable is cached.

Also measured and reported as an extra field: ``end_to_end_preds_per_sec`` —
the full serving chain a user gets (on-device brute-force KNN over a 50k
training set -> exact re-rank -> gather -> fused solve).

Mosaic compilation costs ~10 minutes per program cold through the
remote-compile tunnel, so this script first probes compile time in a
subprocess with a timeout; ``scripts/warm_pallas_cache.py`` pre-fills the
persistent compilation cache (.jax_cache) making the probe a few-second
cache hit in the expected case.

Timing methodology (honest in-loop protocol; details in PERF.md and
:mod:`muygpys_tpu.performance.headline`): iterate inside one jitted
``lax.fori_loop`` with per-iteration input perturbation, subtract a
1-iteration program, sync by materializing a scalar on the host.

Baseline: the reference publishes no numbers (BASELINE.md); the driver's
north-star target is >= 1e6 predictions/sec on a v5e-8 (8 chips), i.e. a
125k/sec/chip share.  ``vs_baseline`` is measured value / 125000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import functools
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
PROBE_TIMEOUT_S = 480  # the probe compiles serve AND train loop programs


def _pallas_available() -> "tuple[bool, bool]":
    """Compile the Pallas loop programs in a subprocess with a timeout.

    A cache hit (persistent .jax_cache or the remote-compile service's own
    cache) takes seconds; a cold Mosaic compile takes ~10 min per program
    and we don't gamble the bench run on it.  On success the caches are
    warm, so the in-process compiles below are fast either way.

    Returns ``(serve_ok, train_ok)``: the serve programs compile first and
    print ``PALLAS_OK``, then the train programs print ``PALLAS_TRAIN_OK``
    — on a partial cache (serve warm, train cold) the timeout/nonzero-exit
    paths still honor whatever markers made it to stdout, so a cold train
    compile cannot demote the serve benchmark to the ~12x slower XLA path.
    """
    code = (
        "import functools;"
        "import muygpys_tpu.performance.headline as h;"
        f"h.enable_persistent_cache({REPO_ROOT!r});"
        "h.compile_loops(h.pallas_coords_loop, h.make_coords_inputs());"
        "h.compile_loops("
        "functools.partial(h.end_to_end_loop, use_pallas=True),"
        "h.make_serve_inputs());"
        "h.compile_loops("
        "functools.partial(h.end_to_end_loop, use_pallas=True, rerank=False),"
        "h.make_serve_inputs());"
        "print('PALLAS_OK');"
        "h.compile_loops(h.fused_train_loop, h.make_train_inputs());"
        "print('PALLAS_TRAIN_OK')"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO_ROOT,
        )
        if "PALLAS_OK" not in out.stdout:
            # make silent fallback visible: a demotion to the XLA path
            # costs ~12x, so the reason must be in the log
            print(
                f"bench: pallas probe failed rc={out.returncode} "
                f"stderr_tail={out.stderr[-2000:]!r}",
                file=sys.stderr,
            )
            return False, False
        return True, "PALLAS_TRAIN_OK" in out.stdout
    except subprocess.TimeoutExpired as exc:
        # partial progress still counts: capture_output pipes stdout into
        # the exception, so a warm serve cache is honored even when the
        # train programs' cold Mosaic compile eats the timeout
        partial = exc.stdout or b""
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        print(
            f"bench: pallas probe timed out after {PROBE_TIMEOUT_S}s "
            "(cold Mosaic compile; run scripts/warm_pallas_cache.py); "
            f"markers seen: {partial.strip()!r}",
            file=sys.stderr,
        )
        return "PALLAS_OK" in partial, "PALLAS_TRAIN_OK" in partial
    except OSError as err:
        print(f"bench: pallas probe failed to spawn: {err}", file=sys.stderr)
        return False, False


def main():
    sys.path.insert(0, REPO_ROOT)
    # Probe BEFORE the parent touches JAX: the subprocess must also acquire
    # the accelerator to compile, which fails on runtimes with exclusive
    # device acquisition if the parent already holds it.
    use_pallas, use_pallas_train = _pallas_available()

    from muygpys_tpu.performance import headline as h

    h.enable_persistent_cache(REPO_ROOT)

    if use_pallas:
        best = h.measure(h.pallas_coords_loop, h.make_coords_inputs())
    else:
        best = h.measure(h.xla_loop, h.make_inputs())
    preds_per_sec = h.BATCH / best

    e2e = h.measure(
        functools.partial(h.end_to_end_loop, use_pallas=use_pallas),
        h.make_serve_inputs(),
    )
    e2e_per_sec = h.BATCH / e2e

    # FastServer(rerank=False): serve on the kernel's approximate
    # neighborhoods — no top_k, no row shuffle (PERF.md r3)
    e2e_approx = h.measure(
        functools.partial(
            h.end_to_end_loop, use_pallas=use_pallas, rerank=False
        ),
        h.make_serve_inputs(),
    )
    e2e_approx_per_sec = h.BATCH / e2e_approx

    # training headline: whole-trajectory LOO value+grad steps (lool,
    # length_scale + noise free, batch 2048) inside one compiled loop —
    # the fused Pallas analytic-gradient kernel, or the XLA lane-layout
    # jit(value_and_grad) fallback
    train_step = h.measure(
        h.fused_train_loop if use_pallas_train else h.xla_train_loop,
        h.make_train_inputs(),
    )
    train_steps_per_sec = 1.0 / train_step

    print(
        json.dumps(
            {
                "metric": "posterior_predictions_per_sec_per_chip",
                "value": round(preds_per_sec, 1),
                "unit": "predictions/sec",
                "vs_baseline": round(preds_per_sec / 125000.0, 3),
                "end_to_end_preds_per_sec": round(e2e_per_sec, 1),
                "end_to_end_preds_per_sec_approx": round(
                    e2e_approx_per_sec, 1
                ),
                "end_to_end_train_count": h.TRAIN_COUNT,
                "train_steps_per_sec": round(train_steps_per_sec, 1),
                "train_batch": h.TRAIN_BATCH,
                "train_engine": (
                    "pallas-fused" if use_pallas_train else "xla-lanes"
                ),
                "engine": "pallas-coords" if use_pallas else "xla-lanes",
            }
        )
    )


if __name__ == "__main__":
    main()
