from muygpys_tpu.gp.kernels.experimental.shear import (
    ShearKernel,
    ShearKernel2in3out,
)

__all__ = ["ShearKernel", "ShearKernel2in3out"]
