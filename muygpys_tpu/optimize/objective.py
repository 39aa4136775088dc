"""LOO cross-validation objective assembly.

API parity: reference ``optimize/objective.py:20-118``
(``make_loo_crossval_fn``, ``make_kernels_fn``).  The assembled objective is a
pure function of named free hyperparameters closing over fixed tensors — a
valid jit+grad surface: the dict of kwargs is a JAX pytree, so chassis can
compile ``value_and_grad`` of the whole pipeline (kernel -> Cholesky solve ->
loss), which the reference never does (it is derivative-free even on its jax
backend, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from muygpys_tpu.optimize.loss import LossFn


def make_kernels_fn(
    kernel_fn: Callable,
    pairwise_diffs,
    crosswise_diffs,
) -> Callable:
    def kernels_fn(*args, **kwargs):
        Kin = kernel_fn(pairwise_diffs, *args, **kwargs)
        Kcross = kernel_fn(crosswise_diffs, *args, **kwargs)
        return Kin, Kcross

    return kernels_fn


def make_loo_crossval_fn(
    loss_fn: LossFn,
    kernel_fn: Callable,
    mean_fn: Callable,
    var_fn: Callable,
    scale_fn: Callable,
    pairwise_diffs,
    crosswise_diffs,
    batch_nn_targets,
    batch_targets,
    batch_features=None,
    target_mask=None,
    loss_kwargs: Optional[Dict] = None,
) -> Callable:
    """Assemble ``obj_fn(**free_params) -> -loss`` over a fixed batch."""
    if loss_kwargs is None:
        loss_kwargs = dict()
    kernels_fn = make_kernels_fn(kernel_fn, pairwise_diffs, crosswise_diffs)
    predict_and_loss_fn = loss_fn.make_predict_and_loss_fn(
        mean_fn,
        var_fn,
        scale_fn,
        batch_nn_targets,
        batch_targets,
        target_mask=target_mask,
        **loss_kwargs,
    )

    def obj_fn(*args, **kwargs):
        if batch_features is not None:
            kwargs.setdefault("batch_features", batch_features)
        Kin, Kcross = kernels_fn(*args, **kwargs)
        return predict_and_loss_fn(Kin, Kcross, *args, **kwargs)

    return obj_fn
