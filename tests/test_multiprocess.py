"""Multi-PROCESS distributed correctness: 2 processes x 4 CPU devices.

The reference proves its MPI backend with 4 local ranks in CI
(``mpirun -n 4 python tests/backend/mpi_correctness.py``,
``.github/workflows/develop-test.yml:78-98``); this is the JAX equivalent:
spawn real separate processes, bring them up through
``initialize_distributed`` (the production multi-host entry point), build a
global batch from per-process chunks, and assert the sharded objective /
gradient / posterior / scale agree across processes AND with a
single-process serial oracle.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    env["JAX_ENABLE_X64"] = "1"
    env["PYTHONPATH"] = REPO_ROOT
    return env


@pytest.fixture(scope="module")
def mp_results():
    port = _free_port()
    env = _worker_env()
    script = os.path.join(REPO_ROOT, "tests", "_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(NPROC), str(port)],
            env=env,
            cwd=REPO_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout={out}\nstderr="
            f"{err[-3000:]}"
        )
        outs.append(out)
    results = []
    for out in outs:
        lines = [
            ln for ln in out.splitlines() if ln.startswith("MPRESULT ")
        ]
        assert lines, f"no MPRESULT in worker output: {out!r}"
        results.append(json.loads(lines[0][len("MPRESULT "):]))
    return results


def _serial_oracle():
    """Single-process unsharded evaluation of the identical problem."""
    import jax
    import jax.numpy as jnp

    from _mp_problem import build_problem
    from muygpys_tpu.optimize import L_BFGS_B_optimize, lool_fn

    model, (cw, pw, bt, bnt) = build_problem()
    obj_fn = L_BFGS_B_optimize.make_obj_fn(
        model, bt, bnt, cw, pw, loss_fn=lool_fn
    )
    val, grads = jax.jit(jax.value_and_grad(lambda p: obj_fn(**p)))(
        {"length_scale": 0.7, "noise": 2e-3}
    )
    _, (rcw, rpw, rbt, rbnt) = build_problem(batch=61)
    robj_fn = L_BFGS_B_optimize.make_obj_fn(
        model, rbt, rbnt, rcw, rpw, loss_fn=lool_fn
    )
    rval, rgrads = jax.jit(jax.value_and_grad(lambda p: robj_fn(**p)))(
        {"length_scale": 0.7, "noise": 2e-3}
    )
    Kin = model.kernel(pw)
    Kcross = model.kernel(cw)
    mean, var = model.posterior_mean_and_variance(Kin, Kcross, bnt)
    scale = model.scale.get_opt_fn(model)(Kin, bnt)
    return {
        "obj": float(val),
        "obj_ragged": float(rval),
        "grad_ls_ragged": float(rgrads["length_scale"]),
        "grad_length_scale": float(grads["length_scale"]),
        "grad_noise": float(grads["noise"]),
        "mean_sum": float(jnp.sum(mean)),
        "var_sum": float(jnp.sum(var)),
        "scale": float(np.asarray(scale).reshape(-1)[0]),
    }


def test_processes_agree(mp_results):
    """Every process computes identical sharded results (lockstep, like the
    reference's replicated-optimizer determinism, SURVEY §2.12)."""
    assert len(mp_results) == NPROC
    ref = mp_results[0]
    for r in mp_results[1:]:
        for key in ref:
            if key == "process":
                continue
            np.testing.assert_allclose(
                r[key], ref[key], rtol=1e-12,
                err_msg=f"cross-process mismatch on {key}",
            )


def test_matches_serial_oracle(mp_results):
    """Sharded-over-2-processes == serial, at f64 tightness (the
    mpi_correctness.py serial-oracle technique)."""
    oracle = _serial_oracle()
    for r in mp_results:
        for key, want in oracle.items():
            np.testing.assert_allclose(
                r[key], want, rtol=1e-9,
                err_msg=f"process {r['process']} mismatch vs serial on "
                f"{key}",
            )
