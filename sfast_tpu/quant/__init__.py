from sfast_tpu.quant.calibrate import (
    Calibration,
    calibrate_controlnet_pipeline,
    calibrate_pipeline,
    calibrate_svd_pipeline,
)
from sfast_tpu.quant.dynamic_quant import (
    quantize_conv_params,
    quantize_linear_params,
    quantize_pipeline,
)

__all__ = [
    "Calibration",
    "calibrate_controlnet_pipeline",
    "calibrate_pipeline",
    "calibrate_svd_pipeline",
    "quantize_linear_params",
    "quantize_conv_params",
    "quantize_pipeline",
]
