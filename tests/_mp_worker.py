"""Worker process for the multi-process distributed-correctness test.

Mirrors the reference's MPI CI topology — ``mpirun -n 4 python
tests/backend/mpi_correctness.py`` proves multi-node semantics with local
ranks (reference ``.github/workflows/develop-test.yml:78-98``) — with JAX's
local-cluster bring-up: N processes x M virtual CPU devices on one machine,
cross-process collectives over gloo.

Each worker:
1. calls ``initialize_distributed`` with explicit coordinator kwargs (the
   production multi-host entry point),
2. builds the hybrid (dcn, ici) mesh spanning ALL processes,
3. constructs the global training batch from its process-local chunk
   (``shard_global``),
4. evaluates the jitted LOO lool objective and its gradient, and one
   posterior-mean/variance predict, on the sharded batch,
5. prints one JSON line with the results.

The parent test asserts every process prints the same values, equal to a
single-process serial oracle — the reference's ``_consistent_assert``
technique (``_test/utils.py:391-404``).

Invoked as: python _mp_worker.py <process_id> <num_processes> <port>
(the parent sets JAX_PLATFORMS/XLA_FLAGS in the child env).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from muygpys_tpu.parallel import (
        initialize_distributed,
        make_hybrid_mesh,
        shard_batch_global,
    )

    ok = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "distributed init failed"

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, (
        f"process_count={jax.process_count()} != {nproc}"
    )

    from _mp_problem import build_problem

    model, tensors = build_problem()
    cw, pw, bt, bnt = tensors

    mesh = make_hybrid_mesh()
    cw, pw, bt, bnt = shard_batch_global((cw, pw, bt, bnt), mesh)

    from muygpys_tpu.optimize import L_BFGS_B_optimize, lool_fn

    # tensors are passed as jit ARGUMENTS (not closure constants): global
    # sharded arrays span non-addressable devices, so they must enter the
    # program through its parameters for SPMD partitioning
    def dict_obj(p, cw, pw, bt, bnt):
        obj_fn = L_BFGS_B_optimize.make_obj_fn(
            model, bt, bnt, cw, pw, loss_fn=lool_fn
        )
        return obj_fn(**p)

    val, grads = jax.jit(jax.value_and_grad(dict_obj))(
        {"length_scale": 0.7, "noise": 2e-3}, cw, pw, bt, bnt
    )

    @jax.jit
    def predict_sums(cw, pw, bnt):
        Kin = model.kernel(pw)
        Kcross = model.kernel(cw)
        mean, var = model.posterior_mean_and_variance(Kin, Kcross, bnt)
        scale = model.scale.get_opt_fn(model)(Kin, bnt)
        return (
            jnp.sum(mean),
            jnp.sum(var),
            jnp.asarray(scale).reshape(-1)[0],
        )

    mean_sum, var_sum, scale = predict_sums(cw, pw, bnt)

    # ragged global batch (61 rows over 8 devices / 2 processes — the
    # reference's _get_chunk_sizes semantics, _src/mpi_utils.py:36-41):
    # shard_ragged_global pads to the device multiple with edge rows and a
    # 0/1 weight vector; each process contributes only its own chunk
    from muygpys_tpu.parallel import shard_ragged_global

    _, rtensors = build_problem(batch=61)
    (rcw, rpw, rbt, rbnt), rw = shard_ragged_global(rtensors, mesh)

    def dict_obj_w(p, cw, pw, bt, bnt, w):
        obj_fn = L_BFGS_B_optimize.make_obj_fn(
            model, bt, bnt, cw, pw, loss_fn=lool_fn,
            loss_kwargs={"row_weights": w},
        )
        return obj_fn(**p)

    rval, rgrads = jax.jit(jax.value_and_grad(dict_obj_w))(
        {"length_scale": 0.7, "noise": 2e-3}, rcw, rpw, rbt, rbnt, rw
    )

    out = {
        "process": pid,
        "obj": float(val),
        "obj_ragged": float(rval),
        "grad_ls_ragged": float(rgrads["length_scale"]),
        "grad_length_scale": float(grads["length_scale"]),
        "grad_noise": float(grads["noise"]),
        "mean_sum": float(mean_sum),
        "var_sum": float(var_sum),
        "scale": float(scale),
    }
    print("MPRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
