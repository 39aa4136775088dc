"""Pre-compile the headline Pallas loop programs into the persistent cache.

Mosaic compilation of the unrolled fused-predict kernel costs ~10 minutes
through the remote-compile tunnel (PERF.md).  This script pays that cost
once and stores the executables in the repo-local persistent compilation
cache (``<repo>/.jax_cache``) so that ``bench.py`` — run later, in a fresh
process — hits the cache and uses the Pallas path as the headline.

The loop programs are built from :mod:`muygpys_tpu.performance.headline`,
the SAME module bench.py uses, because the cache is keyed on the whole
jitted program.

Usage: PYTHONPATH=<repo> python scripts/warm_pallas_cache.py
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from muygpys_tpu.performance import headline as h  # noqa: E402


def main():
    import functools

    h.enable_persistent_cache(REPO_ROOT)
    t0 = time.perf_counter()
    h.compile_loops(h.pallas_coords_loop, h.make_coords_inputs())
    print(
        f"pallas coords loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(
        functools.partial(h.end_to_end_loop, use_pallas=True),
        h.make_serve_inputs(),
    )
    print(
        f"end-to-end serve loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(
        functools.partial(h.end_to_end_loop, use_pallas=True, rerank=False),
        h.make_serve_inputs(),
    )
    print(
        f"end-to-end (rerank=False) loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(
        functools.partial(h.end_to_end_loop, use_pallas=True, rerank=False),
        h.make_serve_1m_inputs(),
    )
    print(
        f"million-scale end-to-end loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(h.fused_train_loop, h.make_train_inputs())
    print(
        f"fused train loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(h.fused_train_loop_gen, h.make_train_inputs())
    print(
        f"free-smoothness fused train loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(h.pallas_coords_gen_loop, h.make_coords_inputs())
    print(
        f"free-smoothness coords serve loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(
        functools.partial(h.shear_serve_loop, engine="pallas"),
        h.make_shear_inputs(),
    )
    print(
        f"shear multiout solve loop programs compiled in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )
    t0 = time.perf_counter()
    h.compile_loops(h.pallas_loop, h.make_inputs())
    print(f"pallas loop programs compiled in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
