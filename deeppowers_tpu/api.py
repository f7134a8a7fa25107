"""High-level Python API: Model / Pipeline / load_model / quantize_model.

Mirrors the reference's Python package surface (reference:
src/api/python/deeppowers/__init__.py:54-72 — load_model, convert_model,
optimize_model, quantize_model, benchmark_model; model.py:114-659 — Model
.from_pretrained/.generate/.generate_stream/.generate_batch/.benchmark;
pipeline.py:15-84 — Pipeline.from_pretrained/generate/save/load) — without
the mock fallback backend (model.py:9-74): this one is real everywhere.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from .config import (
    GenerationConfig,
    QuantConfig,
    QuantMode,
    RuntimeConfig,
)
from .models import hf_import, presets
from .models.transformer import (
    TransformerConfig,
    init_params,
    param_nbytes,
    quantize_params,
)
from .runtime import checkpoint as ckpt
from .runtime.engine import InferenceEngine
from .serving.tokenizer import TokenizerBase, load_tokenizer


def is_tpu_available() -> bool:
    """TPU analogue of the reference's cuda utils (cpp/bindings.cpp:203-205
    hardcoded CUDA info — here it is real)."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def tpu_device_count() -> int:
    try:
        return len(jax.devices())
    except RuntimeError:  # pragma: no cover
        return 0


class Model:
    """User-facing model handle: config + params (+ tokenizer + engine)."""

    def __init__(self, cfg: TransformerConfig, params: Any,
                 tokenizer: Optional[TokenizerBase] = None,
                 *, name: str = "model", quant: Optional[QuantConfig] = None,
                 mesh=None, runtime: Optional[RuntimeConfig] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer or load_tokenizer(None)
        self.name = name
        self.quant = quant
        self.mesh = mesh
        self.runtime = runtime or RuntimeConfig()
        self.kv_layout = "contiguous"
        self.kv_total_pages: Optional[int] = None
        self.draft: Optional[tuple] = None   # (params, cfg) draft model
        self._engine: Optional[InferenceEngine] = None

    # -- construction -------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, *, dtype=jnp.bfloat16,
                        mesh=None, runtime: Optional[RuntimeConfig] = None
                        ) -> "Model":
        """Load from an HF checkpoint dir, our checkpoint dir, or a preset
        name (random init — for tests/benches).

        reference: model.py:114-165 from_pretrained(device, dtype incl int4).
        """
        if os.path.isdir(path):
            if os.path.exists(os.path.join(path, "manifest.json")):
                params, cfg, extra = ckpt.load_checkpoint(path)
                quant = None
                if extra.get("quant"):
                    quant = QuantConfig(
                        mode=QuantMode(extra["quant"]["mode"]),
                        group_size=extra["quant"].get("group_size", 0),
                        act_bits=extra["quant"].get("act_bits", 0))
                tok = _maybe_tokenizer(path)
                return cls(cfg, params, tok, name=os.path.basename(path),
                           quant=quant, mesh=mesh, runtime=runtime)
            if os.path.exists(os.path.join(path, "config.json")):
                cfg, params = hf_import.load_checkpoint(path, dtype=dtype)
                tok = _maybe_tokenizer(path)
                return cls(cfg, params, tok, name=os.path.basename(path),
                           mesh=mesh, runtime=runtime)
            raise FileNotFoundError(f"no checkpoint found in {path}")
        if path in presets.PRESETS:
            cfg = presets.PRESETS[path]
            params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
            return cls(cfg, params, name=path, mesh=mesh, runtime=runtime)
        raise FileNotFoundError(
            f"{path!r} is neither a checkpoint directory nor a preset "
            f"({sorted(presets.PRESETS)})")

    # -- engine -------------------------------------------------------------
    @property
    def engine(self) -> InferenceEngine:
        if self._engine is None:
            kv_dtype = self.quant.kv_cache_dtype if self.quant else "bf16"
            self._engine = InferenceEngine(
                self.params, self.cfg,
                runtime=self.runtime,
                eos_token_id=self.tokenizer.eos_token_id,
                kv_cache_dtype=kv_dtype,
                kv_layout=self.kv_layout,
                kv_total_pages=self.kv_total_pages,
                draft_params=self.draft[0] if self.draft else None,
                draft_cfg=self.draft[1] if self.draft else None,
                mesh=self.mesh)
        return self._engine

    def _reset_engine(self) -> None:
        self._engine = None

    def _guide_kwargs(self, kw: Dict) -> Dict:
        """Map guided_regex / guided_choice / guided_json kwargs to a
        compiled structured-output guide (serving/structured.py)."""
        if not (set(kw) & {"guided_regex", "guided_choice", "guided_json"}):
            return kw
        from .serving.structured import (compile_guide, guide_for_choice,
                                         guide_for_json)
        if "guided_regex" in kw:
            kw["guide"] = compile_guide(kw.pop("guided_regex"),
                                        self.tokenizer)
        elif "guided_choice" in kw:
            kw["guide"] = guide_for_choice(kw.pop("guided_choice"),
                                           self.tokenizer)
        else:
            sj = kw.pop("guided_json")
            kw["guide"] = guide_for_json(sj if isinstance(sj, dict) else None,
                                         self.tokenizer)
        return kw

    # -- generation (reference: model.py:167-381) ---------------------------
    def generate(self, prompt: Union[str, Sequence[int]],
                 config: Optional[GenerationConfig] = None, **kw):
        """Returns a string, or a list of num_return_sequences strings when
        that is > 1 (reference: InferenceConfig.num_return_sequences,
        inference_engine.hpp:19-41). Distinct slots draw independent sample
        streams, so copies differ under sampling."""
        config = _cfg(config, self._guide_kwargs(kw))
        ids = self._encode(prompt)
        n = max(1, config.num_return_sequences)
        if n > 1:
            results = self.engine.generate_batch([ids] * n, config)
            return [self.tokenizer.decode(r.token_ids) for r in results]
        res = self.engine.generate(ids, config)
        return self.tokenizer.decode(res.token_ids)

    def generate_batch(self, prompts: Sequence[Union[str, Sequence[int]]],
                       config: Optional[GenerationConfig] = None,
                       **kw) -> List[str]:
        config = _cfg(config, self._guide_kwargs(kw))
        idss = [self._encode(p) for p in prompts]
        results = self.engine.generate_batch(idss, config)
        return [self.tokenizer.decode(r.token_ids) for r in results]

    def generate_stream(self, prompt: Union[str, Sequence[int]],
                        callback: Callable[[str], bool],
                        config: Optional[GenerationConfig] = None,
                        **kw) -> str:
        config = _cfg(config, self._guide_kwargs(kw))
        ids = self._encode(prompt)
        # engine streams token ids; decode incrementally here, holding back a
        # *possibly* partial UTF-8 suffix for at most one extra token (a
        # persistent replacement char means genuinely invalid bytes — emit it)
        acc: List[int] = []
        prev = [""]
        held = [0]

        def cb(tok: int) -> bool:
            acc.append(tok)
            text = self.tokenizer.decode(acc)
            if text.endswith("�") and held[0] == 0:
                held[0] = 1
                return True
            held[0] = 0
            delta = text[len(prev[0]):]
            prev[0] = text
            return callback(delta) if delta else True

        res = self.engine.generate_stream(ids, config, callback=cb)
        final = self.tokenizer.decode(res.token_ids)
        if len(final) > len(prev[0]):   # flush a held-back tail
            callback(final[len(prev[0]):])
        return final

    def _encode(self, prompt: Union[str, Sequence[int]]) -> List[int]:
        if isinstance(prompt, str):
            return self.tokenizer.encode(prompt)
        return list(prompt)

    def set_draft(self, draft: "Model") -> "Model":
        """Attach a draft model for draft-model speculative decoding (used
        when RuntimeConfig.speculative_tokens > 0; same tokenizer/vocab
        required)."""
        self.draft = (draft.params, draft.cfg)
        self._reset_engine()
        return self

    # -- quantization (reference: model.py:470-600, __init__.py:211-224) ----
    def apply_quantization(self, precision: str = "int8", *,
                           group_size: int = 0,
                           layer_overrides: Optional[Dict[str, str]] = None,
                           kv_cache_dtype: str = "bf16",
                           calibration: Optional[Sequence] = None,
                           awq_clip: bool = True,
                           method: str = "gptq",
                           act_bits: Optional[int] = None) -> "Model":
        """Quantize in place. precision: int8 | int4 | w4a16 | mixed | w8a8
        | w4a8 (the a8 variants run dynamic per-row int8 activations — int8
        MXU dots at 2x the bf16 rate and ~92% of the int8 streaming ceiling
        for int4 weights vs ~66% for weight-only; docs/benchmarks.md).

        "int4" IS W4A8 by default — the measured-fastest int4 path, with a
        ppl delta vs bf16 activations at noise level (tests/
        test_optimizer_eval.py). Use precision="w4a16" (or act_bits=0) for
        float-activation weight-only int4.

        `calibration` (prompts or token-id lists) switches on the
        calibrated int4 accuracy path, `method`:
        - "gptq" (default): Hessian-compensated quantization
          (quant/gptq.py) — measured on trained weights, the only int4
          recipe under the 0.1 delta-ppl gate at g128
          (docs/benchmarks.md round-3 table: +0.069 vs RTN's +0.164)
        - "awq": activation-aware 4-edge smoothing + per-group clip search
          (quant/smooth.awq_quantize)
        - "awq+gptq": smooth first, then GPTQ on the smoothed model."""
        mode = {"int8": QuantMode.INT8, "int4": QuantMode.INT4,
                "w4a16": QuantMode.INT4,
                "mixed": QuantMode.MIXED, "w8a8": QuantMode.INT8,
                "w4a8": QuantMode.INT4}[precision]
        if act_bits is None:
            act_bits = 8 if precision in ("w8a8", "w4a8", "int4") else 0
        qcfg = QuantConfig(mode=mode, group_size=group_size,
                           act_bits=act_bits,
                           layer_overrides=layer_overrides or
                           ({"attention": "int8", "mlp": "int4"}
                            if mode == QuantMode.MIXED else {}),
                           kv_cache_dtype=kv_cache_dtype)
        if calibration is not None:
            sample_ids = [self._encode(p) for p in calibration]
            if mode == QuantMode.MIXED and method != "awq":
                # GPTQ has no per-layer-kind MIXED path; AWQ does
                method = "awq"
            if method == "awq":
                from .quant.smooth import awq_quantize
                self.params = awq_quantize(self.params, self.cfg,
                                           sample_ids, qcfg, clip=awq_clip)
            elif method in ("gptq", "awq+gptq"):
                from .quant.gptq import gptq_quantize
                self.params = gptq_quantize(
                    self.params, self.cfg, sample_ids, qcfg,
                    smooth=(method == "awq+gptq"))
            else:
                raise ValueError(f"unknown quantization method {method!r}")
        else:
            self.params = quantize_params(self.params, qcfg)
        self.quant = qcfg
        self._reset_engine()
        return self

    @property
    def nbytes(self) -> int:
        return param_nbytes(self.params)

    @property
    def is_quantized(self) -> bool:
        return self.quant is not None and self.quant.mode != QuantMode.NONE

    # -- persistence (reference: gpt_weights.cpp:64-97 save;
    #    test_quantization.cpp:152-170 quantized persistence) ---------------
    def save(self, path: str) -> None:
        extra = {}
        if self.quant:
            extra["quant"] = {"act_bits": self.quant.act_bits,
                              "mode": self.quant.mode.value,
                              "group_size": self.quant.group_size}
        ckpt.save_checkpoint(path, self.params, self.cfg, extra)
        try:
            self.tokenizer.save(os.path.join(path, "tokenizer.json"))
        except NotImplementedError:
            pass

    save_pretrained = save

    # -- benchmark (reference: model.py:602-659 — warmup 3, runs 10,
    #    avg/min/max latency + tokens/s) ------------------------------------
    def benchmark(self, prompt: str = "Hello", max_tokens: int = 32,
                  warmup: int = 3, runs: int = 10) -> Dict[str, float]:
        ids = self._encode(prompt)
        gen = GenerationConfig(max_tokens=max_tokens, temperature=0.0,
                               do_sample=False)
        for _ in range(warmup):
            self.engine.generate(ids, gen)
        lat = []
        for _ in range(runs):
            t0 = time.perf_counter()
            res = self.engine.generate(ids, gen)
            lat.append(time.perf_counter() - t0)
        total_tokens = max_tokens * runs
        return {
            "avg_latency_ms": sum(lat) / len(lat) * 1e3,
            "min_latency_ms": min(lat) * 1e3,
            "max_latency_ms": max(lat) * 1e3,
            "throughput_tokens_per_sec": total_tokens / sum(lat),
        }


class Pipeline:
    """Tokenize -> generate -> detokenize, HF-pipeline-like
    (reference: pipeline.py:15-84)."""

    def __init__(self, model: Model):
        self.model = model

    @classmethod
    def from_pretrained(cls, path: str, **kw) -> "Pipeline":
        return cls(Model.from_pretrained(path, **kw))

    def __call__(self, prompt: str, **kw) -> str:
        return self.generate(prompt, **kw)

    def generate(self, prompt: str,
                 config: Optional[GenerationConfig] = None, **kw) -> str:
        return self.model.generate(prompt, config, **kw)

    def save(self, path: str) -> None:
        self.model.save(path)

    @classmethod
    def load(cls, path: str) -> "Pipeline":
        return cls(Model.from_pretrained(path))


# ---------------------------------------------------------------------------
# Module-level convenience API (reference: __init__.py:54-72)
# ---------------------------------------------------------------------------

def load_model(path: str, **kw) -> Model:
    return Model.from_pretrained(path, **kw)


def quantize_model(model: Model, precision: str = "int8", **kw) -> Model:
    """reference: __init__.py:211-224 (precision in int8/int4/mixed)."""
    if precision not in ("int8", "int4", "w4a16", "mixed", "w8a8", "w4a8"):
        raise ValueError(f"unsupported precision {precision!r}")
    return model.apply_quantization(precision, **kw)


def benchmark_model(model: Model, **kw) -> Dict[str, float]:
    """reference: __init__.py:226-241."""
    return model.benchmark(**kw)


def convert_model(path: str, output_path: str, *, dtype=jnp.bfloat16,
                  precision: Optional[str] = None,
                  group_size: int = 0) -> str:
    """Convert an HF checkpoint to our native (optionally quantized)
    checkpoint format (reference: convert_model, __init__.py:116+ and the
    stub format loaders it never implemented)."""
    model = Model.from_pretrained(path, dtype=dtype)
    if precision:
        model.apply_quantization(precision, group_size=group_size)
    model.save(output_path)
    return output_path


def _maybe_tokenizer(path: str) -> Optional[TokenizerBase]:
    for cand in ("tokenizer.json", "tokenizer.model"):
        p = os.path.join(path, cand)
        if os.path.exists(p):
            try:
                return load_tokenizer(p)
            except Exception:
                continue
    try:
        return load_tokenizer(path)
    except Exception:
        return None


def _cfg(config: Optional[GenerationConfig], kw: Dict) -> GenerationConfig:
    if config is None:
        config = GenerationConfig()
    if kw:
        config = dataclasses.replace(config, **kw)
    return config
