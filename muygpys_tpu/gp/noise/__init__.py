from muygpys_tpu.gp.noise.heteroscedastic import HeteroscedasticNoise
from muygpys_tpu.gp.noise.homoscedastic import HomoscedasticNoise
from muygpys_tpu.gp.noise.noise_fn import NoiseFn
from muygpys_tpu.gp.noise.null import NullNoise
from muygpys_tpu.gp.noise.shear import ShearNoise33

__all__ = [
    "HeteroscedasticNoise",
    "HomoscedasticNoise",
    "NoiseFn",
    "NullNoise",
    "ShearNoise33",
]
