"""Tokenizer + engine throughput benchmark (reference: scripts/benchmark.py
— tokenizer encode latency avg/p95, batch throughput, RSS)."""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_tokenizer(tok, texts, runs=200):
    lat = []
    for i in range(runs):
        t0 = time.perf_counter()
        tok.encode(texts[i % len(texts)])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    t0 = time.perf_counter()
    tok.encode_batch(texts * 8)
    batch_dt = time.perf_counter() - t0
    return {
        "encode_avg_ms": float(lat.mean()),
        "encode_p95_ms": float(np.percentile(lat, 95)),
        "batch_texts_per_sec": len(texts) * 8 / batch_dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="text file; defaults to built-in sentences")
    args = ap.parse_args()

    if args.corpus:
        with open(args.corpus) as f:
            texts = [ln.strip() for ln in f if ln.strip()][:64]
    else:
        texts = ["The quick brown fox jumps over the lazy dog."] * 8 + \
                ["TPU inference with quantized weights is fast."] * 8

    from deeppowers_tpu.serving.tokenizer import BPETokenizer, ByteTokenizer
    results = {}
    bpe = BPETokenizer.train(texts, vocab_size=400)
    results["python_bpe"] = bench_tokenizer(bpe, texts)
    results["byte"] = bench_tokenizer(ByteTokenizer(), texts)
    try:
        from deeppowers_tpu.serving.native_tokenizer import CppBPETokenizer
        results["cpp_bpe"] = bench_tokenizer(
            CppBPETokenizer(merges=bpe.merges), texts)
    except Exception as e:
        results["cpp_bpe"] = {"error": str(e)[:100]}

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    for name, stats in results.items():
        print(f"{name}: {stats}")
    print(f"rss_mb: {rss_mb:.1f}")


if __name__ == "__main__":
    main()
