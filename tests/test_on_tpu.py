"""On-device kernel tests — run only when a real TPU backend is present.

The main suite forces the CPU platform (conftest.py) and exercises kernels
in interpret mode; this file re-checks the Mosaic-compiled paths. Run
directly (bypassing conftest's platform override):

    python tests/test_on_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_on_tpu():
    import jax
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0
    import jax.numpy as jnp
    import numpy as np

    from deeppowers_tpu.ops.attention import attention_decode, attention_prefill
    from deeppowers_tpu.ops.pallas.decode_attention import decode_attention_kernel
    from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul
    from deeppowers_tpu.quant import dequantize, quantize

    rng = np.random.default_rng(0)
    failures = []

    # dequant matmul: all modes
    for bits, gs in [(8, 0), (8, 128), (4, 0), (4, 128)]:
        K, N, M = 1024, 1408, 24
        w = jnp.asarray(rng.standard_normal((K, N), dtype=np.float32) * 0.05)
        x = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
        qw = quantize(w, bits=bits, group_size=gs)
        ref = np.asarray(x @ dequantize(qw))
        out = np.asarray(dequant_matmul(x, qw, out_dtype=jnp.float32))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        status = "ok" if rel < 0.01 else "FAIL"
        print(f"dequant_matmul bits={bits} gs={gs}: rel={rel:.5f} {status}")
        if rel >= 0.01:
            failures.append(f"dequant_matmul {bits} {gs}")
        if bits == 4 and gs == 128:
            # both in-block scaling strategies through Mosaic (block_k=256
            # forces the pre-scale path where the modes diverge)
            for mode in ("grouped", "scale"):
                out = np.asarray(dequant_matmul(
                    x, qw, out_dtype=jnp.float32, block_k=256,
                    int4_mode=mode))
                rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
                status = "ok" if rel < 0.01 else "FAIL"
                print(f"dequant_matmul int4 mode={mode}: rel={rel:.5f} "
                      f"{status}")
                if rel >= 0.01:
                    failures.append(f"int4 mode {mode}")

    # flash attention
    b, s, h, d = 2, 1024, 4, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    lens = jnp.array([1024, 700], jnp.int32)
    ref = attention_prefill(q, k, v, lengths=lens, use_flash=False)
    out = attention_prefill(q, k, v, lengths=lens, use_flash=True)
    err = max(float(jnp.max(jnp.abs(out[i, :int(lens[i])] -
                                    ref[i, :int(lens[i])])))
              for i in range(b))
    print(f"flash_attention: err={err:.5f} {'ok' if err < 0.05 else 'FAIL'}")
    if err >= 0.05:
        failures.append("flash_attention")

    # decode attention kernel (bf16)
    B, S, Kh, rep, D = 4, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((B, Kh * rep, D)), dtype=jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    lens = jnp.asarray(rng.integers(1, S + 1, (B,)), dtype=jnp.int32)
    ref = attention_decode(q, kc, vc, lens)
    out = decode_attention_kernel(q, kc, vc, lens)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"decode_attention_kernel: err={err:.5f} "
          f"{'ok' if err < 0.05 else 'FAIL'}")
    if err >= 0.05:
        failures.append("decode_attention_kernel")

    # MXU decode attention (head-folded, flat cache)
    from deeppowers_tpu.ops.pallas.decode_attention import decode_attention_mxu
    out = decode_attention_mxu(q, kc, vc, lens)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"decode_attention_mxu: err={err:.5f} "
          f"{'ok' if err < 0.05 else 'FAIL'}")
    if err >= 0.05:
        failures.append("decode_attention_mxu")

    # paged MXU decode attention (table-walking, double-buffered DMA)
    from deeppowers_tpu.ops.pallas.decode_attention import (
        decode_attention_paged_mxu)
    from deeppowers_tpu.runtime import kvcache_paged
    for dt in ("bf16", "int8"):
        ci = kvcache_paged.init_paged_cache(1, B, S, Kh, D, page_size=128,
                                            kv_cache_dtype=dt)[0]
        tabh = np.zeros((B, S // 128), np.int32)
        alloc = kvcache_paged.PageAllocator(ci.k_pool.shape[0], B, S // 128)
        for bb in range(B):
            alloc.ensure(tabh, bb, S, 128)
        ci = kvcache_paged.with_table((ci,), jnp.asarray(tabh))[0]
        for bb in range(B):
            ci = kvcache_paged.write_prompt(ci, kc[bb], vc[bb], bb)
        kd, vd = kvcache_paged.read(ci, jnp.float32)
        refp = attention_decode(q, kd, vd, lens)
        outp = decode_attention_paged_mxu(q, ci.k_pool, ci.v_pool, ci.table,
                                          lens, ci.k_scale, ci.v_scale)
        err = float(jnp.max(jnp.abs(outp.astype(jnp.float32) - refp)))
        print(f"decode_attention_paged_mxu {dt}: err={err:.5f} "
              f"{'ok' if err < 0.05 else 'FAIL'}")
        if err >= 0.05:
            failures.append(f"decode_attention_paged_mxu {dt}")

    # in-place Pallas KV appends (contiguous bf16 + int8-with-scales)
    from deeppowers_tpu.runtime import kvcache as kvc
    for dt, tol in (("bf16", 0.02), ("int8", 0.05)):
        cc = kvc.init_cache(1, B, S, Kh, D, kv_cache_dtype=dt)[0]
        rows_k = jnp.asarray(rng.standard_normal((B, Kh, D)),
                             dtype=jnp.float32)
        pos = jnp.asarray(rng.integers(0, S, (B,)), dtype=jnp.int32)
        cc = kvc.append_token(cc, rows_k, rows_k * 0.5, pos)
        got, _ = kvc.read(cc, jnp.float32)
        err = max(float(jnp.max(jnp.abs(got[bb, int(pos[bb])]
                                        - rows_k[bb]))) for bb in range(B))
        print(f"kv_append scatter {dt}: err={err:.5f} "
              f"{'ok' if err < tol else 'FAIL'}")
        if err >= tol:
            failures.append(f"kv_append {dt}")

    # verify-window MXU attention (T tokens folded into output rows)
    from deeppowers_tpu.ops.pallas.decode_attention import (
        verify_attention_mxu)
    from deeppowers_tpu.ops.attention import attention_verify
    T = 4
    qv = jnp.asarray(rng.standard_normal((B, T, Kh * rep, D)),
                     dtype=jnp.float32)
    vlens = jnp.asarray(rng.integers(1, S - T, (B,)), dtype=jnp.int32)
    refv = attention_verify(qv, kc, vc, vlens)
    outv = verify_attention_mxu(qv, kc, vc, vlens)
    err = float(jnp.max(jnp.abs(outv - refv)))
    print(f"verify_attention_mxu: err={err:.5f} "
          f"{'ok' if err < 0.05 else 'FAIL'}")
    if err >= 0.05:
        failures.append("verify_attention_mxu")

    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL ON-DEVICE KERNEL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(_run_on_tpu())
