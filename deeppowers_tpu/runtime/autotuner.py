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


def _encode(params: Dict[str, Any], space: Dict[str, Sequence[Any]],
            keys: List[str]) -> np.ndarray:
    """Param dict -> normalized index vector in [0, 1]^k."""
    return np.array([space[k].index(params[k]) / max(len(space[k]) - 1, 1)
                     for k in keys])


def bayesian_search(objective: Callable[[Dict[str, Any]], float],
                    space: Dict[str, Sequence[Any]],
                    *, num_trials: int = 15, init_trials: int = 4,
                    seed: int = 0, minimize: bool = True) -> TuningResult:
    """BAYESIAN method (reference: auto_tuner.hpp:26-32): GP surrogate with
    an RBF kernel over normalized discrete indices + expected-improvement
    acquisition over the full candidate lattice. Pure numpy — the spaces
    here are small (tens of combos), so the O(n^3) GP solve is free while
    each objective evaluation costs a kernel compile + timed run."""
    rng = np.random.default_rng(seed)
    keys = list(space)
    space = {k: list(v) for k, v in space.items()}
    combos = [dict(zip(keys, c))
              for c in itertools.product(*[space[k] for k in keys])]
    rng.shuffle(combos)
    sign = 1.0 if minimize else -1.0

    observed: List[Tuple[Dict, float]] = []
    trials: List[Dict] = []

    def evaluate(params) -> None:
        try:
            score = objective(params)
        except Exception as e:
            trials.append({"params": params, "error": str(e)})
            return
        trials.append({"params": params, "score": score})
        observed.append((params, sign * score))

    for params in combos[:init_trials]:
        evaluate(params)

    ls = 0.35                                 # RBF length scale (normalized)
    for _ in range(max(num_trials - init_trials, 0)):
        if len(observed) >= len(combos):
            break
        if not observed:
            evaluate(combos[len(trials) % len(combos)])
            continue
        x_obs = np.stack([_encode(p, space, keys) for p, _ in observed])
        y_obs = np.array([y for _, y in observed])
        y_mu, y_sd = y_obs.mean(), max(y_obs.std(), 1e-12)
        yn = (y_obs - y_mu) / y_sd
        d2 = ((x_obs[:, None] - x_obs[None]) ** 2).sum(-1)
        k_xx = np.exp(-d2 / (2 * ls * ls)) + 1e-6 * np.eye(len(x_obs))
        alpha = np.linalg.solve(k_xx, yn)
        tried = {tuple(sorted(p.items())) for p, _ in observed}
        cands = [c for c in combos if tuple(sorted(c.items())) not in tried]
        x_c = np.stack([_encode(c, space, keys) for c in cands])
        d2c = ((x_c[:, None] - x_obs[None]) ** 2).sum(-1)
        k_cx = np.exp(-d2c / (2 * ls * ls))
        mu = k_cx @ alpha
        var = np.maximum(1.0 - np.einsum(
            "ij,jk,ik->i", k_cx, np.linalg.inv(k_xx), k_cx), 1e-9)
        sd = np.sqrt(var)
        best_y = yn.min()
        z = (best_y - mu) / sd
        phi = np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi)
        cdf = 0.5 * (1 + np.vectorize(_erf)(z / np.sqrt(2)))
        ei = sd * (z * cdf + phi)             # expected improvement
        evaluate(cands[int(np.argmax(ei))])

    return _finish(observed, trials, sign)


def _erf(x):
    import math
    return math.erf(x)


def _finish(observed, trials, sign) -> TuningResult:
    if not observed:
        raise RuntimeError("all tuning trials failed")
    best_params, best_y = min(observed, key=lambda t: t[1])
    return TuningResult(best_params=best_params, best_score=sign * best_y,
                        trials=trials)


def genetic_search(objective: Callable[[Dict[str, Any]], float],
                   space: Dict[str, Sequence[Any]],
                   *, population: int = 8, generations: int = 4,
                   mutation_rate: float = 0.25, seed: int = 0,
                   minimize: bool = True) -> TuningResult:
    """GENETIC method (reference: auto_tuner.hpp:26-32): tournament
    selection + uniform crossover + per-gene mutation over the discrete
    lattice."""
    rng = np.random.default_rng(seed)
    keys = list(space)
    space = {k: list(v) for k, v in space.items()}
    sign = 1.0 if minimize else -1.0
    observed: List[Tuple[Dict, float]] = []
    trials: List[Dict] = []
    memo: Dict[Tuple, float] = {}

    def fitness(params) -> float:
        key = tuple(sorted(params.items()))
        if key in memo:
            return memo[key]
        try:
            score = objective(params)
        except Exception as e:
            trials.append({"params": params, "error": str(e)})
            memo[key] = np.inf
            return np.inf
        trials.append({"params": params, "score": score})
        y = sign * score
        observed.append((params, y))
        memo[key] = y
        return y

    pop = [{k: space[k][rng.integers(len(space[k]))] for k in keys}
           for _ in range(population)]
    for _ in range(generations):
        scores = [fitness(p) for p in pop]
        nxt = []
        while len(nxt) < population:
            # tournament of 2, twice -> two parents
            a, b = rng.integers(population, size=2)
            p1 = pop[a] if scores[a] <= scores[b] else pop[b]
            a, b = rng.integers(population, size=2)
            p2 = pop[a] if scores[a] <= scores[b] else pop[b]
            child = {k: (p1 if rng.random() < 0.5 else p2)[k] for k in keys}
            for k in keys:                    # mutation
                if rng.random() < mutation_rate:
                    child[k] = space[k][rng.integers(len(space[k]))]
            nxt.append(child)
        pop = nxt
    for p in pop:                             # score the final generation
        fitness(p)
    return _finish(observed, trials, sign)


def annealing_search(objective: Callable[[Dict[str, Any]], float],
                     space: Dict[str, Sequence[Any]],
                     *, num_trials: int = 25, t0: float = 1.0,
                     cooling: float = 0.85, seed: int = 0,
                     minimize: bool = True) -> TuningResult:
    """ANNEALING method (reference: auto_tuner.hpp:26-32): random-neighbor
    walk on the discrete lattice with Metropolis acceptance and geometric
    temperature decay. Scores are normalized by the running spread so the
    temperature scale is unitless."""
    rng = np.random.default_rng(seed)
    keys = list(space)
    space = {k: list(v) for k, v in space.items()}
    sign = 1.0 if minimize else -1.0
    observed: List[Tuple[Dict, float]] = []
    trials: List[Dict] = []

    def evaluate(params) -> Optional[float]:
        try:
            score = objective(params)
        except Exception as e:
            trials.append({"params": params, "error": str(e)})
            return None
        trials.append({"params": params, "score": score})
        y = sign * score
        observed.append((params, y))
        return y

    cur = {k: space[k][rng.integers(len(space[k]))] for k in keys}
    cur_y = evaluate(cur)
    temp = t0
    for _ in range(num_trials - 1):
        k = keys[rng.integers(len(keys))]     # move one coordinate +-1 step
        idx = space[k].index(cur[k])
        step = rng.choice([-1, 1])
        nidx = int(np.clip(idx + step, 0, len(space[k]) - 1))
        cand = dict(cur)
        cand[k] = space[k][nidx]
        y = evaluate(cand)
        if y is None:
            temp *= cooling
            continue
        ys = [v for _, v in observed]
        spread = max(max(ys) - min(ys), 1e-12)
        if cur_y is None or y <= cur_y or \
                rng.random() < np.exp(-(y - cur_y) / (spread * temp)):
            cur, cur_y = cand, y
        temp *= cooling
    return _finish(observed, trials, sign)


SEARCH_METHODS = {
    "grid": grid_search,
    "random": random_search,
    "bayesian": bayesian_search,
    "genetic": genetic_search,
    "annealing": annealing_search,
}


# ---------------------------------------------------------------------------
# Concrete tuners
# ---------------------------------------------------------------------------

def tune_dequant_matmul(k: int, n: int, m: int = 32, bits: int = 8,
                        group_size: int = 0, *, iters: int = 200,
                        cache: bool = True) -> TuningResult:
    """Tune (block_n, block_k) — and for grouped int4 the in-block scaling
    mode ("grouped" sub-dots vs "scale" row-scaled single dot) — for one
    weight shape on the current device."""
    from ..ops.pallas.dequant_matmul import dequant_matmul
    from ..quant.quantize import quantize

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    qw = quantize(w, bits=bits, group_size=group_size)

    def objective(p) -> float:
        bn, bk = p["block_n"], p["block_k"]
        mode = p.get("int4_mode", "grouped")
        run = jax.jit(lambda x: jax.lax.fori_loop(
            0, iters,
            lambda i, acc: acc + jnp.sum(dequant_matmul(
                x + i, qw, out_dtype=jnp.bfloat16,
                block_n=bn, block_k=bk,
                int4_mode=mode).astype(jnp.float32)),
            jnp.float32(0)))
        float(run(x))  # compile + run
        t0 = time.perf_counter()
        float(run(x * 1.000001))
        return (time.perf_counter() - t0) / iters

    space = {"block_n": [256, 512, 1024], "block_k": [256, 512, 1024, 2048]}
    suffix = ""
    if bits == 4 and group_size:
        # grouped int4 exposes the in-block scaling strategy; which wins is
        # shape-dependent (sub-dot pipeline fills vs per-value VPU scaling).
        # "_m2" versions the cache key: entries persisted before this
        # dimension existed must not satisfy (and so suppress) the search.
        space["int4_mode"] = ["grouped", "scale"]
        suffix = "_m2"
    name = f"dqmm_{bits}b_g{group_size}_{m}x{k}x{n}{suffix}" if cache \
        else None
    res = grid_search(objective, space, cache_name=name)
    from ..ops.pallas import dequant_matmul as dqmm_mod
    dqmm_mod.set_dqmm_blocks(k, n, bits, res.best_params["block_n"],
                             res.best_params["block_k"])
    if "int4_mode" in res.best_params:
        dqmm_mod.set_dqmm_int4_mode(k, n, res.best_params["int4_mode"])
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
                if best.get("int4_mode"):
                    dqmm_mod.set_dqmm_int4_mode(k, nn, best["int4_mode"])
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
