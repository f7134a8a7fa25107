"""deeppowers-tpu: a TPU-native quantized LLM inference and serving engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
deeppowers/deeppowers (C++/CUDA reference): INT8/INT4 weight quantization
with calibration, quantized KV cache, continuous-batching serving with
streaming decode, tensor/data/expert parallelism over TPU meshes, and fused
dequant-matmul Pallas kernels.

Public API parity target: reference src/api/python/deeppowers/__init__.py.
"""

from .version import __version__, version
from .config import (
    CalibrationMethod,
    GenerationConfig,
    MeshConfig,
    QuantConfig,
    QuantMode,
    RuntimeConfig,
    SchedulerConfig,
)
from .api import (
    Model,
    Pipeline,
    benchmark_model,
    convert_model,
    is_tpu_available,
    load_model,
    quantize_model,
    tpu_device_count,
)
from .serving.tokenizer import (
    BPETokenizer,
    ByteTokenizer,
    HFTokenizer,
    TokenizerBase as Tokenizer,
    load_tokenizer,
)

__all__ = [
    "__version__",
    "version",
    "CalibrationMethod",
    "GenerationConfig",
    "MeshConfig",
    "QuantConfig",
    "QuantMode",
    "RuntimeConfig",
    "SchedulerConfig",
    "Model",
    "Pipeline",
    "benchmark_model",
    "convert_model",
    "is_tpu_available",
    "load_model",
    "quantize_model",
    "tpu_device_count",
    "BPETokenizer",
    "ByteTokenizer",
    "HFTokenizer",
    "Tokenizer",
    "load_tokenizer",
]
