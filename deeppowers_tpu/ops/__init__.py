"""Compute ops: quantized matmul, attention, norms, rotary, sampling.

jnp reference implementations run everywhere (XLA fuses them); Pallas TPU
kernels under ops/pallas/ are swapped in for the hot paths.
"""

from .matmul import quantized_matmul
from .normalization import layer_norm, rms_norm
from .rotary import apply_rope, rope_frequencies
from .attention import attention_decode, attention_prefill, repeat_kv
from .sampling import SamplingParams, apply_penalties, logprobs_of, sample, top_k_top_p_mask

__all__ = [
    "quantized_matmul",
    "layer_norm",
    "rms_norm",
    "apply_rope",
    "rope_frequencies",
    "attention_decode",
    "attention_prefill",
    "repeat_kv",
    "SamplingParams",
    "apply_penalties",
    "logprobs_of",
    "sample",
    "top_k_top_p_mask",
]
