"""Auto-tuner: parameter search over runtime/kernel knobs.

Reference analogue: AutoTuner (reference: src/core/inference/
auto_tuner.hpp:26-430 — GRID/RANDOM search methods, LATENCY/THROUGHPUT/
BALANCED objectives, TuningParameter discrete sets, target batch sizes,
quantization-config tuning; 1182-LoC implementation). TPU scope: the things
that actually matter here —

  - dequant-matmul block sizes (block_n, block_k) per weight shape,
  - decode batch-slot count and prefill buckets,
  - quantization scheme sweep (int8 / int4 x group size) scored by a
    quality-vs-speed objective.

Results are cached per (device_kind, model_name, dtype) in a JSON file
(reference caches tuning results too).
"""

from __future__ import annotations

import itertools
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TuningResult:
    best_params: Dict[str, Any]
    best_score: float
    trials: List[Dict] = field(default_factory=list)
    cached: bool = False


def _cache_path() -> str:
    return os.path.join(os.path.expanduser("~"), ".deeppowers_tpu",
                        "autotune.json")


def _cache_key(name: str) -> str:
    try:
        dev = jax.devices()[0].device_kind
    except RuntimeError:  # pragma: no cover
        dev = "unknown"
    return f"{dev}::{name}"


def _load_cache() -> Dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _save_cache(cache: Dict) -> None:
    os.makedirs(os.path.dirname(_cache_path()), exist_ok=True)
    with open(_cache_path(), "w") as f:
        json.dump(cache, f, indent=2)


def grid_search(objective: Callable[[Dict[str, Any]], float],
                space: Dict[str, Sequence[Any]],
                *, minimize: bool = True,
                max_trials: Optional[int] = None,
                cache_name: Optional[str] = None) -> TuningResult:
    """Exhaustive grid search (reference: auto_tuner.hpp GRID method).

    objective returns a score (latency seconds, etc.); exceptions mark the
    trial invalid.
    """
    if cache_name:
        cache = _load_cache()
        hit = cache.get(_cache_key(cache_name))
        if hit:
            return TuningResult(best_params=hit["params"],
                                best_score=hit["score"], cached=True)
    keys = list(space)
    combos = list(itertools.product(*[space[k] for k in keys]))
    if max_trials:
        combos = combos[:max_trials]
    best, best_score, trials = None, None, []
    for combo in combos:
        params = dict(zip(keys, combo))
        try:
            score = objective(params)
        except Exception as e:
            trials.append({"params": params, "error": str(e)})
            continue
        trials.append({"params": params, "score": score})
        better = best_score is None or (
            score < best_score if minimize else score > best_score)
        if better:
            best, best_score = params, score
    if best is None:
        raise RuntimeError("all tuning trials failed")
    if cache_name:
        cache = _load_cache()
        cache[_cache_key(cache_name)] = {"params": best, "score": best_score}
        _save_cache(cache)
    return TuningResult(best_params=best, best_score=best_score, trials=trials)


def random_search(objective: Callable[[Dict[str, Any]], float],
                  space: Dict[str, Sequence[Any]],
                  *, num_trials: int = 20, seed: int = 0,
                  minimize: bool = True) -> TuningResult:
    """RANDOM method (reference: auto_tuner.hpp:26-32)."""
    rng = np.random.default_rng(seed)
    keys = list(space)
    best, best_score, trials = None, None, []
    for _ in range(num_trials):
        params = {k: space[k][rng.integers(len(space[k]))] for k in keys}
        try:
            score = objective(params)
        except Exception as e:
            trials.append({"params": params, "error": str(e)})
            continue
        trials.append({"params": params, "score": score})
        better = best_score is None or (
            score < best_score if minimize else score > best_score)
        if better:
            best, best_score = params, score
    if best is None:
        raise RuntimeError("all tuning trials failed")
    return TuningResult(best_params=best, best_score=best_score, trials=trials)


# ---------------------------------------------------------------------------
# Concrete tuners
# ---------------------------------------------------------------------------

def tune_dequant_matmul(k: int, n: int, m: int = 32, bits: int = 8,
                        group_size: int = 0, *, iters: int = 200,
                        cache: bool = True) -> TuningResult:
    """Tune (block_n, block_k) for one weight shape on the current device."""
    from ..ops.pallas.dequant_matmul import dequant_matmul
    from ..quant.quantize import quantize

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    qw = quantize(w, bits=bits, group_size=group_size)

    def objective(p) -> float:
        bn, bk = p["block_n"], p["block_k"]
        run = jax.jit(lambda x: jax.lax.fori_loop(
            0, iters,
            lambda i, acc: acc + jnp.sum(dequant_matmul(
                x + i, qw, out_dtype=jnp.bfloat16,
                block_n=bn, block_k=bk).astype(jnp.float32)),
            jnp.float32(0)))
        float(run(x))  # compile + run
        t0 = time.perf_counter()
        float(run(x * 1.000001))
        return (time.perf_counter() - t0) / iters

    space = {"block_n": [256, 512, 1024], "block_k": [256, 512, 1024, 2048]}
    name = f"dqmm_{bits}b_g{group_size}_{m}x{k}x{n}" if cache else None
    res = grid_search(objective, space, cache_name=name)
    from ..ops.pallas import dequant_matmul as dqmm_mod
    dqmm_mod.set_dqmm_blocks(k, n, bits, res.best_params["block_n"],
                             res.best_params["block_k"])
    return res


def install_cached() -> int:
    """Install every persisted tuning result (dequant-matmul + flash block
    choices) into the kernel dispatch caches WITHOUT re-measuring — cheap
    enough to call at engine/bench startup. Returns the number installed."""
    cache = _load_cache()
    n = 0
    from ..ops import attention as attn_mod
    from ..ops.pallas import dequant_matmul as dqmm_mod
    this_dev = _cache_key("")
    for key, entry in cache.items():
        if not key.startswith(this_dev):
            continue                 # tunings are device-kind specific
        best = entry.get("params") if isinstance(entry, dict) else None
        if not best:
            continue
        name = key[len(this_dev):]
        try:
            if name.startswith("dqmm_"):
                # dqmm_{bits}b_g{gs}_{m}x{k}x{n}
                parts = name.split("_")
                bits = int(parts[1][:-1])
                m, k, nn = (int(v) for v in parts[3].split("x"))
                dqmm_mod.set_dqmm_blocks(k, nn, bits, best["block_n"],
                                         best["block_k"])
                n += 1
            elif name.startswith("flash_"):
                # flash_{b}x{s}x{h}x{d}
                b, sq, h, d = (int(v) for v in name.split("_")[1].split("x"))
                attn_mod.set_flash_blocks(sq, d, best["block_q"],
                                          best["block_k"])
                n += 1
        except (KeyError, ValueError, IndexError):
            continue
    return n


def tune_model_matmuls(cfg, *, bits: int = 8, group_size: int = 0,
                       m: int = 8, fused: bool = True) -> dict:
    """Tune the dequant-matmul blocks for every distinct weight shape of a
    TransformerConfig (the engine's fused-projection shapes) and install the
    winners. Returns {(k, n): best_params}. One-time per (device, model,
    dtype) — results persist in the autotune cache."""
    h = cfg.hidden_size
    shapes = {(h, cfg.q_size + 2 * cfg.kv_size) if fused
              else (h, cfg.q_size),
              (cfg.q_size, h)}
    if cfg.glu:
        shapes.add((h, 2 * cfg.ffn_size) if fused else (h, cfg.ffn_size))
    else:
        shapes.add((h, cfg.ffn_size))
    shapes.add((cfg.ffn_size, h))
    if not cfg.tie_embeddings:
        shapes.add((h, cfg.vocab_size))
    out = {}
    for k, n in sorted(shapes):
        if (bits == 8 and (k % 256 or n % 128)) or                 (bits == 4 and ((k // 2) % 256 or n % 128)):
            continue     # kernel-ineligible shape; XLA path serves it
        res = tune_dequant_matmul(k, n, m=m, bits=bits,
                                  group_size=group_size)
        out[(k, n)] = res.best_params
    return out


def tune_flash_attention(s: int, d: int, h: int = 8, b: int = 1, *,
                         iters: int = 20, cache: bool = True) -> TuningResult:
    """Tune flash-attention (block_q, block_k) for one (S, D) shape on the
    current device (docs/roadmap.md item 5); the winner is installed into
    ops.attention's block cache so subsequent prefill calls at this shape
    use it automatically."""
    from ..ops import attention as attn_mod
    from ..ops.pallas.flash_attention import flash_attention_prefill

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.bfloat16)
    lens = jnp.full((b,), s, jnp.int32)

    def objective(p) -> float:
        bq, bk = p["block_q"], p["block_k"]
        run = jax.jit(lambda q: jax.lax.fori_loop(
            0, iters,
            lambda i, acc: acc + jnp.sum(flash_attention_prefill(
                q + (i * 1e-6), k, v, lens, block_q=bq,
                block_k=bk).astype(jnp.float32)),
            jnp.float32(0)))
        float(run(q))
        t0 = time.perf_counter()
        float(run(q * 1.000001))
        return (time.perf_counter() - t0) / iters

    space = {"block_q": [256, 512, 1024], "block_k": [256, 512, 1024]}
    name = f"flash_{b}x{s}x{h}x{d}" if cache else None
    res = grid_search(objective, space, cache_name=name)
    attn_mod.set_flash_blocks(s, d, res.best_params["block_q"],
                              res.best_params["block_k"])
    return res


def tune_quantization(model_params, cfg, eval_fn: Callable,
                      *, schemes: Optional[Sequence[Tuple[str, int]]] = None
                      ) -> TuningResult:
    """Sweep quantization schemes scoring quality via eval_fn(params) -> loss
    (e.g. perplexity from runtime.evaluate). reference:
    auto_tuner.hpp:316-347 quantize_model/evaluate_quantization."""
    from ..config import QuantConfig, QuantMode
    from ..models.transformer import quantize_params

    schemes = schemes or [("int8", 0), ("int8", 128), ("int4", 128),
                          ("int4", 64)]

    def objective(p) -> float:
        mode = QuantMode(p["scheme"][0])
        qcfg = QuantConfig(mode=mode, group_size=p["scheme"][1])
        return float(eval_fn(quantize_params(model_params, qcfg)))

    return grid_search(objective, {"scheme": list(schemes)})
