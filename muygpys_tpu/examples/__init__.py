from muygpys_tpu.examples import (
    classify,
    fast_posterior_mean,
    from_indices,
    regress,
    two_class_classify_uq,
)

__all__ = [
    "classify",
    "fast_posterior_mean",
    "from_indices",
    "regress",
    "two_class_classify_uq",
]
