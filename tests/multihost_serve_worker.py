"""Worker for the multi-process SERVING test (HTTP over a replicated engine).

Launched by tests/test_multihost_procs.py as 2 OS processes forming a
jax.distributed world on CPU. Process 0 runs the full serving stack —
HTTP APIServer -> Scheduler -> ReplicatedEngine — and issues real HTTP
requests (one with a stop sequence, one guided). Process 1 runs
ReplicatedEngine.follower_loop(), replaying the leader's engine command
stream, and reports the token ids its engine produced so the test can assert
token-identical generation across the process boundary.

This is the VERDICT r2 item-2 acceptance: a user-facing HTTP request served
by a leader/follower pair returns output identical to a single-process run,
including stop sequences and structured outputs.

Usage: python multihost_serve_worker.py <coord> <nprocs> <pid> <in.json> <out.json>
"""

import json
import sys
import urllib.request


def main() -> None:
    coord, nprocs, pid, in_path, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    spec = json.load(open(in_path))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)

    import jax.numpy as jnp
    from deeppowers_tpu.config import RuntimeConfig, SchedulerConfig
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine
    from deeppowers_tpu.serving.multihost import ReplicatedEngine
    from deeppowers_tpu.serving.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,))
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    rep = ReplicatedEngine(eng, tokenizer=tok)

    out = {"pid": pid}
    if pid == 0:
        from deeppowers_tpu.serving import APIServer, Scheduler
        sched = Scheduler(rep, encode=tok.encode, decode=tok.decode,
                          config=SchedulerConfig())
        sched.tokenizer = tok
        sched.start()
        http = APIServer(sched, host="127.0.0.1", port=spec["port"])
        http.start()
        base = f"http://127.0.0.1:{http.port}"

        def post(body):
            req = urllib.request.Request(
                base + "/api/v1/generate",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.load(r)

        results = []
        for body in spec["requests"]:
            r = post(body)
            results.append({"text": r.get("text"),
                            "tokens": r.get("tokens"),
                            "stop_reason": r.get("stop_reason"),
                            "id": r.get("id")})
        out["results"] = results
        http.stop()
        sched.stop()
        rep.shutdown()
    else:
        rep.follower_loop()
        out["finished"] = {r.request_id: r.token_ids
                           for r in eng.pop_finished()}

    with open(out_path, "w") as f:
        json.dump(out, f, sort_keys=True)


if __name__ == "__main__":
    main()
