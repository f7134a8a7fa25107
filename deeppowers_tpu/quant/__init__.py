"""Quantization core: packed int8/int4 tensors, scales, calibration.

TPU-native counterpart of the reference's quantization stack
(reference: src/core/model/quantization.*, src/core/execution/models/
quantization_manager.*, quantization_kernels.cu).
"""

from .qtypes import (
    INT4_QMAX,
    INT8_QMAX,
    QuantizedTensor,
    pack_int4,
    unpack_int4,
)
from .quantize import (
    compute_scales,
    dequantize,
    dequantize_dynamic,
    dequantize_stacked,
    quantize,
    quantize_dynamic,
    quantize_stacked,
)
from .calibration import Calibrator, Observer

__all__ = [
    "INT4_QMAX",
    "INT8_QMAX",
    "QuantizedTensor",
    "pack_int4",
    "unpack_int4",
    "compute_scales",
    "dequantize",
    "dequantize_dynamic",
    "quantize",
    "quantize_dynamic",
    "quantize_stacked",
    "dequantize_stacked",
    "Calibrator",
    "Observer",
]
