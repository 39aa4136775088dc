from muygpys_tpu.pallas.fused_predict import (
    fused_predict_bl,
    fused_predict_coords_bl,
)

__all__ = ["fused_predict_bl", "fused_predict_coords_bl"]
