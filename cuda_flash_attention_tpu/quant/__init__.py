"""Quantization layer: INT8/FP8 tensors, weight-only dense quant, and the
fused-dequant attention entry points (SURVEY.md §7.8)."""

from cuda_flash_attention_tpu.quant.qtensor import (
    QuantizedTensor,
    dequantize,
    quantize,
    pack_int4,
    quantize_int4,
    quantize_kv,
    supported_quant_dtypes,
    unpack_int4,
)
from cuda_flash_attention_tpu.quant.linear import (
    dense,
    quantize_transformer_params,
    quantize_weight,
    quantized_matmul,
)

__all__ = [
    "QuantizedTensor",
    "quantize",
    "dequantize",
    "quantize_kv",
    "quantize_int4",
    "pack_int4",
    "unpack_int4",
    "supported_quant_dtypes",
    "quantize_weight",
    "quantized_matmul",
    "dense",
    "quantize_transformer_params",
]
