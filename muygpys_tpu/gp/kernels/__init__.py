from muygpys_tpu.gp.kernels.kernel_fn import KernelFn
from muygpys_tpu.gp.kernels.matern import Matern
from muygpys_tpu.gp.kernels.rbf import RBF

__all__ = ["KernelFn", "Matern", "RBF"]
