from muygpys_tpu.gp.hyperparameter.scalar import (
    NamedParameter,
    Parameter,
    ScalarParam,
)
from muygpys_tpu.gp.hyperparameter.vector import (
    NamedVectorParameter,
    VectorParameter,
)
from muygpys_tpu.gp.hyperparameter.tensor import TensorParam
from muygpys_tpu.gp.hyperparameter.scale import (
    AnalyticScale,
    DownSampleScale,
    FixedScale,
    ScaleFn,
)

__all__ = [
    "AnalyticScale",
    "DownSampleScale",
    "FixedScale",
    "NamedParameter",
    "NamedVectorParameter",
    "Parameter",
    "ScalarParam",
    "ScaleFn",
    "TensorParam",
    "VectorParameter",
]
