"""Arrival-driven serving benchmark: Poisson load against the FULL stack.

Every prior serving number was steady-state (fixed batch, warm, constant
occupancy). This measures what the L4 serving layer exists for (reference:
src/core/scheduling/scheduler.cpp:305-376 — queue -> batcher -> workers
under churn; SLO semantics from
src/api/rest/middleware/monitoring_middleware.hpp:22-23): requests arrive
as a Poisson process over HTTP, admission/queueing/batched-prefill/
continuous batching all active, and the tracked outputs are sustained
tokens/s, TTFT p50/p95 (server-side: enqueue -> first token), queue depth,
and preemptions.

Usage:
  python scripts/bench_serving_load.py --config tinyllama-1.1b --quant int8 \
      --rate 12 --duration 45
  python scripts/bench_serving_load.py --smoke    # tiny CPU self-check

bench.py calls run_load() for the tracked serving_load_* fields.
"""

import argparse
import json
import os
import random
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DPT_PLATFORM"):   # axon ignores JAX_PLATFORMS; honor ours
    jax.config.update("jax_platforms", os.environ["DPT_PLATFORM"])

import jax.numpy as jnp


def _percentile(sorted_vals, q):
    if not sorted_vals:
        return float("nan")
    i = min(len(sorted_vals) - 1, int(len(sorted_vals) * q))
    return sorted_vals[i]


def build_stack(cfg_name="tinyllama-1.1b", quant="int8", *, max_batch=16,
                max_seq=1024, prefill_buckets=(64, 128, 256, 512),
                kv_cache_dtype=None, kv_layout="contiguous", **rt_kw):
    """Engine + scheduler + HTTP server on an ephemeral port."""
    from deeppowers_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from deeppowers_tpu.config import (QuantConfig, QuantMode, RuntimeConfig,
                                       SchedulerConfig)
    from deeppowers_tpu.models.presets import PRESETS, tiny_test_config
    from deeppowers_tpu.models.transformer import (init_params,
                                                   init_quantized_params,
                                                   quantize_params)
    from deeppowers_tpu.runtime.engine import InferenceEngine
    from deeppowers_tpu.serving import APIServer, ByteTokenizer, Monitor, Scheduler

    if cfg_name == "tiny":
        cfg = tiny_test_config(vocab_size=260)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        act_dtype = jnp.float32
    else:
        cfg = PRESETS[cfg_name]
        act_dtype = jnp.bfloat16
        qmap = {"int8": (QuantMode.INT8, 0, 0), "none": (None, 0, 0),
                "int4": (QuantMode.INT4, 128, 8), "w8a8": (QuantMode.INT8, 0, 8)}
        qm, gs, ab = qmap[quant]
        if qm is None:
            params = init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
        else:
            qcfg = QuantConfig(mode=qm, group_size=gs, act_bits=ab)
            # draw int weights directly for multi-GB models: a full bf16
            # llama2-7b (13.5 GB) fits alone but exhausts HBM once the
            # engine adds fused params + caches (the async error surfaces
            # only at the first request's device sync — found the hard way)
            big = cfg.num_layers * cfg.hidden_size ** 2 > 2 ** 27
            if big:
                params = init_quantized_params(cfg, qcfg,
                                               jax.random.PRNGKey(0),
                                               dtype=jnp.bfloat16)
            else:
                params = quantize_params(
                    init_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.bfloat16), qcfg)

    kv_kw = {}
    if kv_cache_dtype:
        kv_kw["kv_cache_dtype"] = kv_cache_dtype
    if kv_layout != "contiguous":
        kv_kw["kv_layout"] = kv_layout
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=max_batch, max_seq_len=max_seq,
                              prefill_buckets=prefill_buckets,
                              scan_layers=(kv_layout == "contiguous"
                                           and "auto" or False),
                              # mirror serve.py: AUTO dispatch depth — the
                              # RuntimeConfig default of 1 step/dispatch is
                              # dispatch-bound at ~35 ms/step on this
                              # tunnel and capped every prior load row
                              decode_steps_per_dispatch=0, **rt_kw),
        act_dtype=act_dtype, **kv_kw)
    tok = ByteTokenizer()
    monitor = Monitor()
    sched = Scheduler(eng, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig(
                          max_active_requests=max(64, 4 * max_batch),
                          max_queue_size=max(128, 8 * max_batch),
                          # admission hold: on the ~35 ms/dispatch tunnel
                          # each admission interrupts pipelined decode for
                          # several round trips — hold up to 250 ms for a
                          # small batch of arrivals/freed slots so one
                          # interruption admits several (scheduler.py round
                          # 4; idle admissions stay immediate). Measured at
                          # 10 rps saturation: 218 -> 487 tok/s sustained.
                          batch_timeout_ms=250.0),
                      monitor=monitor)
    sched.start()
    srv = APIServer(sched, port=0, rate_limit_per_minute=10 ** 9)
    srv.start()
    return srv, sched, eng


def measure_capacity(srv, sched, *, duration_s=15.0, concurrency=32,
                     prompt_lens=(64, 128, 256), max_tokens=(48, 96),
                     timeout_s=120.0, seed=0):
    """Closed-loop saturation capacity: `concurrency` always-on clients for
    duration_s; returns sustained generated tok/s. This is the number the
    open-loop offered rate calibrates against (VERDICT r4 item 5: the
    tracked row's rate was arbitrary; now it is ~80% of THIS)."""
    rng = random.Random(seed)
    url = f"http://127.0.0.1:{srv.port}/api/v1/generate"
    stop = time.perf_counter() + duration_s
    done = []
    lock = threading.Lock()

    mts = (max_tokens if isinstance(max_tokens, (tuple, list))
           else (max_tokens,))

    def worker(wid):
        r = random.Random(seed * 1000 + wid)
        while time.perf_counter() < stop:
            pl = r.choice(prompt_lens)
            text = ("the quick brown fox jumps over the lazy dog. "
                    * (pl // 16 + 1))[:pl]
            body = json.dumps({"prompt": text, "max_tokens": r.choice(mts),
                               "temperature": 0.0}).encode()
            try:
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    out = json.loads(resp.read())
                with lock:
                    done.append((time.perf_counter(),
                                 out["usage"]["completion_tokens"]))
            except Exception:  # noqa: BLE001
                pass
    ths = [threading.Thread(target=worker, args=(i,), daemon=True)
           for i in range(concurrency)]
    t0 = time.perf_counter()
    for th in ths:
        th.start()
    for th in ths:
        th.join(timeout=timeout_s + duration_s)
    t1 = time.perf_counter()
    # steady window: skip the first third (ramp)
    w0 = t0 + (t1 - t0) / 3
    toks = sum(n for (t, n) in done if t >= w0)
    return toks / max(t1 - w0, 1e-9), len(done)


def make_bursty_trace(duration_s, rate_rps, *, burst_every_s=8.0,
                      burst_size=12, prompt_lens=(64, 128, 256, 448),
                      max_tokens=(48, 96), seed=0):
    """Synthetic arrival trace: Poisson background + periodic bursts (the
    thundering-herd shape open-loop Poisson never produces). Each entry is
    (t_arrival_s, prompt_len, max_tokens) — replayable via run_load(trace=)
    and serializable to JSONL for regression traces."""
    rng = random.Random(seed)
    events = []
    t = 0.0
    while t < duration_s:
        t += rng.expovariate(rate_rps)
        events.append((t, rng.choice(prompt_lens), rng.choice(max_tokens)))
    t = burst_every_s
    while t < duration_s:
        for _ in range(burst_size):
            events.append((t + rng.random() * 0.05, rng.choice(prompt_lens),
                           rng.choice(max_tokens)))
        t += burst_every_s
    events.sort()
    return events


def warm_stack(srv, prompt_lens, *, timeout_s=600.0):
    """Fire every (bucket, group-size) shape once so compiles happen before
    any measured window (capacity OR load)."""
    url = f"http://127.0.0.1:{srv.port}/api/v1/generate"

    def fire(pl, mtok):
        text = ("the quick brown fox jumps over the lazy dog. "
                * (pl // 16 + 1))[:pl]
        body = json.dumps({"prompt": text, "max_tokens": mtok,
                           "temperature": 0.0}).encode()
        try:
            req = urllib.request.Request(
                url, data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                resp.read()
        except Exception:  # noqa: BLE001
            pass
    for pl in sorted(set(prompt_lens)):
        fire(pl, 8)
    for burst in (8, 4, 2):
        for pl in sorted(set(prompt_lens)):
            ths = [threading.Thread(target=fire, args=(pl, 4), daemon=True)
                   for _ in range(burst)]
            for th in ths:
                th.start()
            for th in ths:
                th.join(timeout=timeout_s)
    srv._load_warmed = True


def run_load(srv, sched, *, rate_rps=8.0, duration_s=30.0, warm_s=5.0,
             prompt_lens=(32, 96, 200, 420), max_tokens=(32, 64),
             seed=0, timeout_s=120.0, trace=None):
    """Drive Poisson arrivals at rate_rps for duration_s — or replay an
    explicit `trace` of (t_arrival_s, prompt_len, max_tokens) events —
    and measure the steady window [warm_s, ...]. Returns the tracked dict."""
    rng = random.Random(seed)
    url = f"http://127.0.0.1:{srv.port}/api/v1/generate"

    results = []
    errors = []
    lock = threading.Lock()
    threads = []

    def fire(prompt_len, mtok, t_sched):
        # ByteTokenizer: 1 char = 1 token, so slice to the exact token count
        text = ("the quick brown fox jumps over the lazy dog. "
                * (prompt_len // 16 + 1))[:prompt_len]
        body = json.dumps({
            "prompt": text, "max_tokens": mtok, "temperature": 0.0,
        }).encode()
        t0 = time.perf_counter()
        try:
            req = urllib.request.Request(url, data=body,
                                         headers={"Content-Type":
                                                  "application/json"})
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                out = json.loads(resp.read())
            t1 = time.perf_counter()
            with lock:
                results.append({
                    "t_done": t1, "t_sent": t0, "latency_s": t1 - t0,
                    "ttft_ms": out["timing"]["ttft_ms"],
                    "tokens": out["usage"]["completion_tokens"],
                })
        except urllib.error.HTTPError as e:
            with lock:
                try:
                    errors.append(f"{e.code}: {e.read()[:300]}")
                except Exception:
                    errors.append(str(e)[:200])
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(str(e)[:200])

    # Warmup: compile every shape the loaded stack will hit BEFORE the
    # clock starts — per-bucket singles AND concurrent bursts (the grouped
    # batched-admission path compiles per (bucket, group-size) with group
    # sizes {2,4,8}; cold-compiling those inside the measured window is
    # exactly the saturation the first tracked run showed). The persistent
    # XLA compile cache (build_stack) makes repeat runs warm.
    if not getattr(srv, "_load_warmed", False):
        warm_stack(srv, prompt_lens, timeout_s=timeout_s)
    results.clear()
    errors.clear()

    stats0 = sched.stats()               # snapshot: stats are cumulative
    depth_samples = []
    stop_sampling = threading.Event()

    def sampler():
        while not stop_sampling.is_set():
            s = sched.stats()
            depth_samples.append((s["queued"], s["active"]))
            stop_sampling.wait(0.25)

    sampler_t = threading.Thread(target=sampler, daemon=True)
    sampler_t.start()

    if trace is None:
        events = []
        t = 0.0
        while t < duration_s:
            t += rng.expovariate(rate_rps)
            events.append((t, rng.choice(prompt_lens),
                           rng.choice(max_tokens)))
    else:
        events = list(trace)
        duration_s = events[-1][0] if events else 0.0
    t_start = time.perf_counter()
    for (t, pl, mt) in events:
        now = time.perf_counter() - t_start
        if t > now:
            time.sleep(t - now)
        th = threading.Thread(target=fire, args=(pl, mt,
                                                 time.perf_counter()),
                              daemon=True)
        th.start()
        threads.append(th)
    # drain
    for th in threads:
        th.join(timeout=timeout_s)
    stop_sampling.set()
    sampler_t.join(timeout=2)
    t_end = time.perf_counter()

    win0 = t_start + warm_s
    in_win = [r for r in results if r["t_done"] >= win0]
    win_span = max(t_end - win0, 1e-9)
    tokens = sum(r["tokens"] for r in in_win)
    ttfts = sorted(r["ttft_ms"] for r in results)
    lats = sorted(r["latency_s"] for r in results)
    depths = sorted(d[0] for d in depth_samples)
    stats = sched.stats()
    return {
        "offered_rps": rate_rps,
        "completed": len(results),
        "errors": len(errors),
        "error_sample": errors[:3],
        "sustained_tok_s": round(tokens / win_span, 1),
        "ttft_p50_ms": round(_percentile(ttfts, 0.50), 1),
        "ttft_p95_ms": round(_percentile(ttfts, 0.95), 1),
        "latency_p50_s": round(_percentile(lats, 0.50), 3),
        "latency_p95_s": round(_percentile(lats, 0.95), 3),
        "queue_depth_p50": _percentile(depths, 0.50),
        "queue_depth_max": depths[-1] if depths else 0,
        "preempted": stats.get("preempted", 0) - stats0.get("preempted", 0),
        "dropped": stats.get("dropped", 0) - stats0.get("dropped", 0),
    }


def calibrated_load(srv, sched, *, target_frac=0.8, duration_s=30.0,
                    prompt_lens=(64, 128, 256, 448), max_tokens=(48, 96),
                    cap_s=15.0, trace=None):
    """Measure saturation capacity, then drive an open-loop load at
    target_frac of it (offered tok/s = rate * mean(max_tokens)). Returns
    the run_load dict + capacity fields.

    Capacity is TWO-phase: a closed-loop pass for a floor estimate, then
    an OVERLOAD Poisson pass at 3x that floor — closed-loop clients only
    send after completing, which ping-pongs with the scheduler's 250 ms
    admission hold and under-measures ~2x (the hold needs streaming
    arrivals to batch; r4's saturation experiments were overload-Poisson)."""
    warm_stack(srv, prompt_lens)
    mean_tok = sum(max_tokens) / len(max_tokens)
    # phase 1: closed-loop floor (same request mix as the load)
    floor_tok_s, n = measure_capacity(srv, sched, duration_s=cap_s / 2,
                                      prompt_lens=prompt_lens[:3],
                                      max_tokens=max_tokens)
    # phase 2: overload Poisson at 3x the floor
    over = run_load(srv, sched,
                    rate_rps=max(1.0, 3.0 * floor_tok_s / mean_tok),
                    duration_s=cap_s, warm_s=cap_s / 3,
                    prompt_lens=prompt_lens, max_tokens=max_tokens)
    cap_tok_s = max(floor_tok_s, over["sustained_tok_s"])
    rate = max(0.5, target_frac * cap_tok_s / mean_tok)
    out = run_load(srv, sched, rate_rps=round(rate, 2),
                   duration_s=duration_s, warm_s=min(8.0, duration_s / 4),
                   prompt_lens=prompt_lens, max_tokens=max_tokens,
                   trace=trace)
    out["capacity_tok_s"] = round(cap_tok_s, 1)
    out["capacity_reqs"] = n
    out["offered_frac_of_capacity"] = target_frac
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tinyllama-1.1b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv-dtype", default=None)
    ap.add_argument("--kv-layout", default="contiguous",
                    choices=["contiguous", "paged"])
    ap.add_argument("--rate", type=float, default=0.0,
                    help="offered rps (0 = calibrate to 80%% of capacity)")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--buckets", default="64,128,256,512")
    ap.add_argument("--chunk", type=int, default=0,
                    help="prefill_chunk_size (0 = off)")
    ap.add_argument("--prompts", default="64,128,256,448")
    ap.add_argument("--gen", default="48,96")
    ap.add_argument("--cap-s", type=float, default=15.0)
    ap.add_argument("--trace", default=None,
                    help="'bursty' or a JSONL file of "
                         "{t, prompt_len, max_tokens} events")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU model, 5s load — harness self-check")
    args = ap.parse_args()

    if args.smoke:
        srv, sched, eng = build_stack("tiny", "none", max_batch=4,
                                      max_seq=96, prefill_buckets=(16, 32))
        trace = (make_bursty_trace(5.0, 4.0, prompt_lens=(8, 20),
                                   max_tokens=(4, 8))
                 if args.trace == "bursty" else None)
        out = run_load(srv, sched, rate_rps=6.0, duration_s=5.0, warm_s=1.0,
                       prompt_lens=(8, 20), max_tokens=(4, 8), trace=trace)
    else:
        rt_kw = {}
        if args.chunk:
            rt_kw["prefill_chunk_size"] = args.chunk
        srv, sched, eng = build_stack(
            args.config, args.quant, max_batch=args.max_batch,
            max_seq=args.max_seq,
            prefill_buckets=tuple(int(b) for b in args.buckets.split(",")),
            kv_cache_dtype=args.kv_dtype, kv_layout=args.kv_layout, **rt_kw)
        prompts = tuple(int(p) for p in args.prompts.split(","))
        gens = tuple(int(g) for g in args.gen.split(","))
        trace = None
        if args.trace == "bursty":
            trace = make_bursty_trace(args.duration, args.rate or 4.0)
        elif args.trace:
            with open(args.trace) as f:
                trace = [(e["t"], e["prompt_len"], e["max_tokens"])
                         for e in map(json.loads, f)]
        if args.rate:
            out = run_load(srv, sched, rate_rps=args.rate,
                           duration_s=args.duration, trace=trace,
                           prompt_lens=prompts, max_tokens=gens)
        else:
            out = calibrated_load(srv, sched, duration_s=args.duration,
                                  trace=trace, prompt_lens=prompts,
                                  max_tokens=gens, cap_s=args.cap_s)
    srv.stop()
    sched.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
