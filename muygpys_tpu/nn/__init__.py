from muygpys_tpu.nn.muygps_layer import DeepKernelMuyGPs, MuyGPsLayer

__all__ = ["DeepKernelMuyGPs", "MuyGPsLayer"]
