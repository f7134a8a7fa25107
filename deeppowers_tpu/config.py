"""Typed configuration for deeppowers-tpu.

One dtype enum and one config family per concern, replacing the reference's
triplicated enums (reference: src/core/model/quantization.hpp:13,
src/core/execution/model.hpp:19-42, src/core/inference/auto_tuner.hpp:52-69 all
define QuantizationType; SURVEY.md Appendix B says: pick one). Dataclasses are
frozen so they can be used as static (hashable) jit arguments.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import jax.numpy as jnp


class QuantMode(str, enum.Enum):
    """Weight/activation quantization mode.

    Covers the reference's QuantizationType {NONE, INT8, INT4, FP16}
    (reference: src/core/execution/model.hpp:19-24) plus the mixed per-layer
    scheme its tests demand (reference: tests/test_quantization.cpp:208-229).
    """

    NONE = "none"
    INT8 = "int8"
    INT4 = "int4"
    FP16 = "fp16"      # on TPU this means bf16 weights (fp16 has no MXU path)
    MIXED = "mixed"    # per-layer-kind overrides via QuantConfig.layer_overrides


class CalibrationMethod(str, enum.Enum):
    """How activation/weight ranges are estimated during calibration.

    Reference enumerates MINMAX/KL_DIVERGENCE/MSE/ENTROPY/PERCENTILE
    (reference: src/core/inference/auto_tuner.hpp:63-69).
    """

    MINMAX = "minmax"
    PERCENTILE = "percentile"
    MSE = "mse"
    ENTROPY = "entropy"
    # The reference lists KL_DIVERGENCE and ENTROPY separately; here ENTROPY
    # already IS the TensorRT-style KL-minimizing threshold
    # (quant/calibration.py _entropy_threshold), so KL_DIVERGENCE is a
    # distinct enum value routed to the same estimator.
    KL_DIVERGENCE = "kl_divergence"


@dataclass(frozen=True)
class QuantConfig:
    """Quantization scheme for a model or a tensor.

    Reference analogue: QuantizationConfig {type, method, per_channel, symmetric,
    calibration_ratio, excluded_ops} (src/core/execution/model.hpp:34-42) and
    QuantConfig {per_channel, symmetric, skip_layers} (src/core/model/quantization.hpp:21-29).

    group_size semantics: 0 => per-channel over the whole contraction axis;
    g > 0 => per-group of g elements along the contraction axis (the INT4
    accuracy recipe, SURVEY.md §7 "Hard parts").
    """

    mode: QuantMode = QuantMode.INT8
    group_size: int = 0
    symmetric: bool = True
    calibration: CalibrationMethod = CalibrationMethod.MINMAX
    percentile: float = 99.9
    # Layer-kind overrides for MIXED mode, e.g. {"attention": "int8", "mlp": "int4",
    # "embedding": "none"} (reference: tests/test_quantization.cpp:208-229).
    layer_overrides: Mapping[str, str] = field(default_factory=dict)
    # Layer names (regex fragments) never quantized
    # (reference: quantization.hpp:28 skip_layers).
    skip_layers: Sequence[str] = ()
    # KV-cache storage dtype: "bf16" | "int8" | "int4"
    # (reference: compress_kv_cache int8 path, gpt_model.cpp:532-545).
    kv_cache_dtype: str = "bf16"
    # Activation quantization at the matmuls: 0 = float activations
    # (weight-only), 8 = dynamic per-row int8 activations -> int8 MXU dots
    # with int32 accumulation (W8A8 with mode=INT8, W4A8 with mode=INT4).
    # Combine with quant/smooth.py smoothing for accuracy.
    act_bits: int = 0

    def __post_init__(self):
        object.__setattr__(self, "layer_overrides", _freeze(self.layer_overrides))
        object.__setattr__(self, "skip_layers", tuple(self.skip_layers))

    def mode_for_layer(self, kind: str) -> QuantMode:
        if self.mode != QuantMode.MIXED:
            return self.mode
        return QuantMode(dict(self.layer_overrides).get(kind, "none"))


class _FrozenDict(dict):
    def __hash__(self):  # hashable so configs stay valid static jit args
        return hash(tuple(sorted(self.items())))

    def _blocked(self, *a, **k):
        raise TypeError("config mapping is frozen")

    __setitem__ = __delitem__ = update = pop = clear = _blocked  # type: ignore


def _freeze(m: Mapping[str, Any]) -> "_FrozenDict":
    return _FrozenDict(m)


@dataclass(frozen=True)
class GenerationConfig:
    """Per-request generation parameters.

    Field set and defaults follow the reference's GenerationConfig /
    InferenceConfig / RequestConfig union (reference:
    src/api/cpp/include/deeppowers.hpp:17-26 {max_tokens 100, temperature 0.7},
    src/core/inference/inference_engine.hpp:19-41 {top_k 50, top_p 0.9},
    src/core/request_queue/request.hpp:27-35 {presence/frequency penalties}).
    """

    max_tokens: int = 100
    min_tokens: int = 0
    temperature: float = 0.7
    top_k: int = 50
    top_p: float = 0.9
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    do_sample: bool = True
    stop_tokens: Sequence[str] = ()
    stop_token_ids: Sequence[int] = ()
    num_return_sequences: int = 1
    seed: int | None = None
    stream: bool = False
    # OpenAI-style additive logit bias {token_id: bias}; ±100 effectively
    # bans/forces a token. Capped at ops/sampling.LOGIT_BIAS_SLOTS entries.
    logit_bias: Mapping[int, float] | None = None
    # compiled structured-output guide (serving/structured.py Guide) — set by
    # the serving layer / Pipeline, not serialized; constrains decoding to a
    # regex / JSON schema / choice set
    guide: Any | None = None

    def __post_init__(self):
        object.__setattr__(self, "stop_tokens", tuple(self.stop_tokens))
        object.__setattr__(self, "stop_token_ids", tuple(self.stop_token_ids))

    def validate(self) -> None:
        """Raise ValueError on invalid parameters.

        Bounds follow reference tests: temperature in [0, 2] rejected outside
        (reference: tests/test_config.cpp:43-50 rejects temp<0 and >1.5 — we
        allow up to 2.0, matching common serving APIs).
        """
        if self.max_tokens <= 0:
            raise ValueError(f"max_tokens must be positive, got {self.max_tokens}")
        if not 0.0 <= self.temperature <= 2.0:
            raise ValueError(f"temperature must be in [0, 2], got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if self.repetition_penalty <= 0.0:
            raise ValueError(
                f"repetition_penalty must be positive, got {self.repetition_penalty}"
            )
        if self.logit_bias:
            from .ops.sampling import LOGIT_BIAS_SLOTS
            if len(self.logit_bias) > LOGIT_BIAS_SLOTS:
                raise ValueError(
                    f"logit_bias supports at most {LOGIT_BIAS_SLOTS} "
                    f"entries, got {len(self.logit_bias)}")


@dataclass(frozen=True)
class RuntimeConfig:
    """Engine-level runtime knobs.

    Reference analogue: RuntimeConfig {batch 32, max seq 2048, timeout, async,
    profiling, log level} (src/core/config/config_manager.hpp:43-50) +
    prefill_chunk_size 512 (inference_engine.hpp:40).
    """

    max_batch_size: int = 32
    max_seq_len: int = 2048
    prefill_chunk_size: int = 512
    # Pad prefill lengths up to one of these buckets to bound recompilation.
    prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048)
    request_timeout_s: float = 600.0
    enable_profiling: bool = False
    # HBM page size (tokens) for the paged KV cache.
    kv_page_size: int = 128
    # Paged-KV reservation policy: "full" reserves a request's whole token
    # budget (prompt + max_tokens) at admission — no mid-decode exhaustion,
    # but conservative. "lazy" reserves prompt + kv_lazy_slack and grows
    # page-by-page as decoding advances; under pool pressure the engine
    # PREEMPTS the youngest request (released pages, stop_reason
    # "preempted") and the scheduler re-enqueues it to resume later.
    kv_reserve: str = "full"
    kv_lazy_slack: int = 64
    # Prefix caching (paged layout only): full pages of a prompt whose token
    # prefix matches a previously-seen prompt are SHARED (refcounted page
    # table entries) and their prefill is skipped. Exact token-key matching
    # at page granularity; unreferenced cached pages are evicted LRU under
    # pool pressure.
    enable_prefix_cache: bool = False
    # Decode steps executed per host dispatch (lax.scan inside one jit).
    # >1 amortizes per-dispatch runtime overhead at the cost of join/stream
    # granularity — raise for serving throughput on high-overhead runtimes.
    # 0 = AUTO: the engine probes at 4 then 12 steps/dispatch, fits the
    # per-dispatch fixed cost vs per-step device time, and settles on the
    # depth that keeps dispatch overhead under ~8% of device time
    # (latency-capped at ~100 ms per dispatch). A co-located host lands at
    # small depths; a remote-tunneled runtime (~35 ms/dispatch measured)
    # climbs toward 32 and multiplies serving throughput.
    decode_steps_per_dispatch: int = 1
    # Pipeline decode dispatches: enqueue dispatch N+1 before harvesting
    # dispatch N's results, hiding the harvest round trip behind device
    # compute (plain decode, non-lazy paging, post-auto-probe only). Host
    # bookkeeping (retires, stop strings) runs one dispatch behind; device
    # math is unchanged.
    pipelined_dispatch: bool = True
    # Batch the prefills of an admission round into per-bucket grouped
    # device programs (weights stream once per group, not once per
    # request). Single-device contiguous-KV engines only; per-request
    # prefill otherwise.
    batched_admission: bool = True
    # Emit per-token top-k (token, logprob) alternatives in results
    # (reference: RequestResult.top_tokens, request.hpp:38-44). 0 = off.
    emit_top_logprobs: int = 0
    # Speculative decoding (prompt-lookup drafting): number of draft tokens
    # verified per step (0 = off). Each step emits 1..K+1 tokens per slot for
    # one forward pass; output distribution is exactly the normal sampling
    # chain's (runtime/speculative.py). Requires the contiguous KV layout.
    speculative_tokens: int = 0
    # n-gram length used to match the token history when drafting.
    speculative_ngram: int = 3
    # Auto-disable speculation when the rolling mean accepted tokens/step
    # falls below this after speculative_probe_steps steps (0 = never).
    # Break-even intuition: a prompt-lookup spec step costs ~1 decode
    # forward plus ~10-20% window overhead, so < ~1.2 accepted/step means
    # speculation is pure overhead on this workload (VERDICT round 1
    # item 8 — acceptance on natural text is workload-dependent; the
    # engine measures instead of assuming).
    speculative_min_accepted: float = 0.0
    speculative_probe_steps: int = 50
    # Sequence-parallel (context-parallel) prefill: shard the prompt over
    # the mesh's data axis and run ring attention (ops/ring_attention.py) —
    # prefill compute and activation memory split p ways (long-context
    # configs). Decode still uses the data axis for slot sharding.
    seq_parallel_prefill: bool = False
    # Compile the layer body once and lax.scan over stacked per-layer params
    # instead of unrolling L layer copies — cuts compile time/program size
    # ~L-fold for deep models (measured 6.6x at 24 layers, decode parity).
    # "auto" (default) turns it on for models with >= 16 homogeneous layers
    # on the contiguous KV layout; True forces it (errors if ineligible);
    # False keeps the unrolled forwards.
    scan_layers: object = "auto"

    def __post_init__(self):
        object.__setattr__(self, "prefill_buckets", tuple(self.prefill_buckets))


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for distributed execution.

    Replaces the reference's DistributedConfig {world_size, ranks, addr,
    pipeline_stages, micro_batch_size} (src/core/distributed/distributed_context.hpp:26-38)
    with named mesh axes: data (DP), model (TP), expert (EP). Pipeline
    parallelism is intentionally absent for inference — TP+EP sharding over ICI
    replaces it (SURVEY.md §5.8).
    """

    data: int = 1
    model: int = 1
    expert: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.expert

    def axis_sizes(self) -> dict[str, int]:
        return {"data": self.data, "model": self.model, "expert": self.expert}


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching scheduler limits.

    Reference analogue: ResourceConstraints {max_batch 32, max_seq 2048,
    max 100 active} + flags (src/core/scheduling/scheduler.hpp:23-39) and
    RequestQueue capacity 1000 (request_queue.hpp:57-66).
    """

    max_batch_size: int = 32
    max_queue_size: int = 1000
    max_active_requests: int = 100
    batch_timeout_ms: float = 10.0
    max_wait_time_ms: float = 100.0
    enable_priority: bool = True
    enable_admission_control: bool = True


def config_to_json(cfg: Any) -> str:
    """Serialize any of the dataclass configs to JSON (ConfigManager parity;
    reference: src/core/config/config_manager.hpp:53-80)."""

    def default(o):
        if isinstance(o, enum.Enum):
            return o.value
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, (tuple, set)):
            return list(o)
        raise TypeError(f"cannot serialize {type(o)}")

    if getattr(cfg, "guide", None) is not None:
        # a compiled Guide holds token-mask arrays; serialize its pattern
        cfg = dataclasses.replace(
            cfg, guide=getattr(cfg.guide, "key", None) or "<guide>")
    return json.dumps(dataclasses.asdict(cfg), default=default, indent=2)


def config_from_json(cls, payload: str):
    """Deserialize a dataclass config from JSON produced by config_to_json."""
    raw = json.loads(payload)
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            continue
        ftype = fields[key].type
        if isinstance(ftype, str):
            if "QuantMode" in ftype:
                value = QuantMode(value)
            elif "CalibrationMethod" in ftype:
                value = CalibrationMethod(value)
        kwargs[key] = value
    return cls(**kwargs)


# Canonical activation dtype on TPU: bf16 feeds the MXU natively.
DEFAULT_ACT_DTYPE = jnp.bfloat16
