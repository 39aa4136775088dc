"""muygpys_tpu: a TPU-native MuyGPs framework.

A from-scratch JAX/XLA/Pallas implementation of nearest-neighbor-sparsified
Gaussian process regression, classification, and UQ with the capabilities of
LLNL/MuyGPyS (reference mounted at /root/reference), redesigned TPU-first:

- single JAX backend; batched Cholesky solvers on the MXU
- jit+grad-able LOO objectives (params are pytrees of named kwargs)
- device-mesh batch sharding via ``jax.sharding`` (replaces MPI)
- on-device brute-force KNN (tiled top-k)
"""

from muygpys_tpu import config

__version__ = "0.1.0"

__all__ = ["config", "__version__"]
