from muygpys_tpu.optimize.batch import (
    full_filtered_batch,
    get_balanced_batch,
    sample_balanced_batch,
    sample_batch,
)
from muygpys_tpu.optimize.chassis import (
    Adam_optimize,
    Bayes_optimize,
    L_BFGS_B_optimize,
    OptimizeFn,
)
from muygpys_tpu.optimize.loss import (
    LossFn,
    cross_entropy_fn,
    lool_fn,
    lool_fn_unscaled,
    looph_fn,
    mse_fn,
    pseudo_huber_fn,
)
from muygpys_tpu.optimize.device_chassis import (
    Device_LBFGS_optimize,
    Fused_Device_LBFGS_optimize,
    device_lbfgs,
    make_device_trainer,
)
from muygpys_tpu.optimize.fast_objective import make_fast_loo_objective
from muygpys_tpu.optimize.shear_objective import make_shear_loo_objective
from muygpys_tpu.optimize.fused_chassis import Fused_L_BFGS_B_optimize
from muygpys_tpu.optimize.objective import make_loo_crossval_fn

__all__ = [
    "Adam_optimize",
    "Bayes_optimize",
    "L_BFGS_B_optimize",
    "LossFn",
    "OptimizeFn",
    "cross_entropy_fn",
    "Device_LBFGS_optimize",
    "device_lbfgs",
    "Fused_Device_LBFGS_optimize",
    "Fused_L_BFGS_B_optimize",
    "full_filtered_batch",
    "get_balanced_batch",
    "make_device_trainer",
    "lool_fn",
    "lool_fn_unscaled",
    "looph_fn",
    "make_fast_loo_objective",
    "make_shear_loo_objective",
    "make_loo_crossval_fn",
    "mse_fn",
    "pseudo_huber_fn",
    "sample_balanced_batch",
    "sample_batch",
]
