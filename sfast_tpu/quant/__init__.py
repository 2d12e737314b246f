from sfast_tpu.quant.dynamic_quant import (
    quantize_conv_params,
    quantize_linear_params,
    quantize_pipeline,
)

__all__ = [
    "quantize_linear_params",
    "quantize_conv_params",
    "quantize_pipeline",
]
