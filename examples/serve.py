"""Launch the serving stack: HTTP + gRPC + scheduler over one engine
(reference: the server wiring in src/core/api/ + examples/advanced_features).

  python examples/serve.py --model gpt2 --port 8000 --grpc-port 50051

Then:
  curl -s localhost:8000/api/v1/generate \
       -d '{"prompt": "hello", "max_tokens": 16}'
  curl -s localhost:8000/metrics
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import deeppowers_tpu as dp
from deeppowers_tpu.config import RuntimeConfig, SchedulerConfig
from deeppowers_tpu.serving import APIServer, Scheduler
from deeppowers_tpu.serving.grpc_server import GRPCServer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--quantize", choices=["none", "int8", "int4"],
                    default="int8")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--grpc-port", type=int, default=50051)
    ap.add_argument("--auth-token", default=None)
    ap.add_argument("--ssl-certfile", default=None,
                    help="PEM cert chain: serve HTTPS (else plaintext)")
    ap.add_argument("--ssl-keyfile", default=None)
    ap.add_argument("--decode-steps", type=int, default=4,
                    help="decode steps per dispatch (amortizes dispatch cost)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="speculative decoding: verify K draft tokens per "
                         "step (0 = off); drafts come from prompt lookup, or "
                         "from --draft when given")
    ap.add_argument("--draft", default=None,
                    help="draft model (preset or checkpoint dir) for "
                         "draft-model speculation")
    ap.add_argument("--scan-layers", action="store_true",
                    help="compile the layer body once and scan over layers "
                         "(much faster startup for deep models)")
    ap.add_argument("--kv-layout", choices=["contiguous", "paged"],
                    default="contiguous")
    ap.add_argument("--kv-reserve", choices=["full", "lazy"], default="full",
                    help="paged only: lazy grows page-by-page and preempts "
                         "under pool pressure (oversubscription)")
    ap.add_argument("--kv-pages", type=int, default=0,
                    help="paged only: total page-pool size (0 = full)")
    ap.add_argument("--max-batch", type=int, default=32,
                    help="continuous-batching slots")
    ap.add_argument("--max-seq", type=int, default=0,
                    help="max context (0 = model max)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="paged only: share KV pages across prompts with a "
                         "common prefix (system prompts prefill once)")
    args = ap.parse_args()

    model = dp.load_model(args.model)
    model.runtime = RuntimeConfig(
        max_batch_size=args.max_batch,
        max_seq_len=args.max_seq or RuntimeConfig().max_seq_len,
        decode_steps_per_dispatch=args.decode_steps,
        speculative_tokens=args.speculative,
        scan_layers=True if args.scan_layers else "auto",
        kv_reserve=args.kv_reserve,
        enable_prefix_cache=args.prefix_cache)
    model.kv_layout = args.kv_layout
    model.kv_total_pages = args.kv_pages or None
    if args.draft:
        model.set_draft(dp.load_model(args.draft))
    model._reset_engine()
    print("warming up (compiling prefill + decode steps)...")
    model.generate("warmup", max_tokens=8, temperature=0.0, do_sample=False)
    print("warmup done")
    if args.quantize != "none":
        dp.quantize_model(model, args.quantize)

    tok = model.tokenizer
    sched = Scheduler(model.engine, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig())
    sched.model_name = args.model        # surfaced at /v1/models
    sched.tokenizer = tok                # chat templates for /v1/chat
    sched.start()

    http = APIServer(sched, host=args.host, port=args.port,
                     auth_token=args.auth_token,
                     ssl_certfile=args.ssl_certfile,
                     ssl_keyfile=args.ssl_keyfile)
    http.start()
    grpc_srv = GRPCServer(sched, host=args.host, port=args.grpc_port)
    grpc_srv.start()

    print(f"http://{args.host}:{http.port}  grpc {args.host}:{grpc_srv.port}")
    print("endpoints: /api/v1/generate  /generate_stream  /generate_batch  "
          "/generate_async  /health  /metrics")
    try:
        while True:
            time.sleep(5)
            alerts = sched.monitor.check_alerts()
            if alerts:
                print("ALERTS:", alerts)
    except KeyboardInterrupt:
        pass
    finally:
        grpc_srv.stop()
        http.stop()
        sched.stop()


if __name__ == "__main__":
    main()
