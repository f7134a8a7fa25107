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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--quantize",
                    choices=["none", "int8", "int4", "w4a16", "w8a8",
                             "w4a8", "mixed"],
                    default="int8",
                    help="int4 IS W4A8 (the fastest int4 path); w4a16 is "
                         "float-activation weight-only int4")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--grpc-port", type=int, default=50051)
    ap.add_argument("--auth-token", default=None)
    ap.add_argument("--ssl-certfile", default=None,
                    help="PEM cert chain: serve HTTPS (else plaintext)")
    ap.add_argument("--ssl-keyfile", default=None)
    ap.add_argument("--decode-steps", type=int, default=0,
                    help="decode steps per dispatch (amortizes dispatch "
                         "cost); 0 = auto-adapt to the measured dispatch "
                         "overhead (default)")
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
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator address — enables "
                         "multi-process serving (leader = process 0 runs "
                         "HTTP/gRPC + scheduler; followers replay its "
                         "engine command stream)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mesh", default=None, metavar="SPEC",
                    help="mesh axes, e.g. 'data=2,model=4' (default: all "
                         "global devices on the model axis)")
    ap.add_argument("--compile-cache", default="auto", metavar="DIR",
                    help="persistent XLA compilation cache dir ('auto' = "
                         "~/.cache/deeppowers_tpu/xla_cache, 'off' to "
                         "disable) — warm server restarts load compiled "
                         "programs from disk instead of re-running XLA")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu' for a local "
                         "multi-process rehearsal) — must be set before "
                         "backend init, hence a flag not an env var (some "
                         "TPU plugins ignore JAX_PLATFORMS)")
    args = ap.parse_args()

    # Bootstrap order matters: platform + distributed BEFORE anything touches
    # the backend (importing deeppowers_tpu queries devices), or
    # jax.distributed silently no-ops and every process serves alone.
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache != "off":
        from deeppowers_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(None if args.compile_cache == "auto"
                             else args.compile_cache)
    from deeppowers_tpu.parallel.mesh import initialize_distributed, make_mesh
    if args.coordinator or args.num_processes > 1:
        if args.num_processes <= 1:
            raise SystemExit(
                "--coordinator requires --num-processes >= 2 (the "
                "distributed bootstrap is a no-op for a world of 1, and "
                "every process would silently serve alone)")
        initialize_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
        if jax.process_count() != args.num_processes:
            raise RuntimeError(
                f"jax.distributed bootstrap failed: process_count "
                f"{jax.process_count()} != --num-processes "
                f"{args.num_processes}")
    import deeppowers_tpu as dp
    from deeppowers_tpu.config import RuntimeConfig, SchedulerConfig
    from deeppowers_tpu.serving import APIServer, Scheduler
    from deeppowers_tpu.serving.grpc_server import GRPCServer
    mesh = None
    if args.mesh or jax.process_count() > 1:
        from deeppowers_tpu.config import MeshConfig
        if args.mesh:
            axes = dict(kv.split("=") for kv in args.mesh.split(","))
            mcfg = MeshConfig(**{k: int(v) for k, v in axes.items()})
        else:
            mcfg = MeshConfig(model=len(jax.devices()))
        mesh = make_mesh(mcfg)

    model = dp.load_model(args.model, mesh=mesh)
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
    engine = model.engine
    replicated = None
    if jax.process_count() > 1:
        # scheduler-as-leader: every engine command the scheduler issues is
        # broadcast; followers replay the identical stream in lockstep
        from deeppowers_tpu.serving.multihost import ReplicatedEngine
        replicated = ReplicatedEngine(engine, tokenizer=tok)
        if jax.process_index() != 0:
            print(f"follower {jax.process_index()}/{jax.process_count()}: "
                  "replaying leader command stream")
            replicated.follower_loop()
            print("follower: leader stopped, exiting")
            return
        engine = replicated
    sched = Scheduler(engine, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig())
    sched.model_name = args.model        # surfaced at /v1/models
    sched.tokenizer = tok                # chat templates for /v1/chat
    sched.start()

    http = APIServer(sched, host=args.host, port=args.port,
                     auth_token=args.auth_token,
                     ssl_certfile=args.ssl_certfile,
                     ssl_keyfile=args.ssl_keyfile)
    http.start()
    grpc_srv = GRPCServer(sched, host=args.host, port=args.grpc_port,
                          ssl_certfile=args.ssl_certfile,
                          ssl_keyfile=args.ssl_keyfile)
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
        if replicated is not None:
            replicated.shutdown()   # release followers


if __name__ == "__main__":
    main()
