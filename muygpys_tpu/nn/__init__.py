from muygpys_tpu.nn.muygps_layer import (
    DeepKernelMuyGPs,
    MultivariateMuyGPsLayer,
    MuyGPsLayer,
)

__all__ = ["DeepKernelMuyGPs", "MultivariateMuyGPsLayer", "MuyGPsLayer"]
