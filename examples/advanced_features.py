"""Advanced features: async futures, multiple stop tokens, priorities,
interactive chat (reference: examples/advanced_features.cpp — async futures,
multi stop tokens, interactive chat)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import concurrent.futures

import deeppowers_tpu as dp
from deeppowers_tpu.config import GenerationConfig, SchedulerConfig
from deeppowers_tpu.serving import Request, RequestPriority, Scheduler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()

    model = dp.load_model(args.model)
    tok = model.tokenizer
    sched = Scheduler(model.engine, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig())
    sched.start()

    try:
        # 1. async fan-out via futures over the scheduler
        print("== async futures ==")
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(
                lambda p=p: sched.submit_sync(Request(
                    prompt=p, config=GenerationConfig(
                        max_tokens=16, temperature=0.7))))
                for p in ["alpha", "beta", "gamma"]]
            for f in concurrent.futures.as_completed(futs):
                req = f.result()
                print(f"  {req.prompt!r}: {req.result.text[:40]!r} "
                      f"({req.result.stop_reason})")

        # 2. multiple stop tokens
        print("== stop tokens ==")
        req = sched.submit_sync(Request(
            prompt="count", config=GenerationConfig(
                max_tokens=64, temperature=0.0, do_sample=False,
                stop_tokens=(".", "\n", "!"))))
        print(f"  stopped by: {req.result.stop_reason}")

        # 3. structured outputs: constrain generation to a grammar
        print("== structured outputs ==")
        from deeppowers_tpu.serving.structured import (guide_for_choice,
                                                       guide_for_json)
        req = sched.submit_sync(Request(
            prompt="Sentiment:", config=GenerationConfig(
                max_tokens=8, temperature=0.0, do_sample=False,
                guide=guide_for_choice(["pos", "neg"], tok))))
        print(f"  choice: {req.result.text!r}")
        req = sched.submit_sync(Request(
            prompt="User record:", config=GenerationConfig(
                max_tokens=80, temperature=0.8,
                guide=guide_for_json(
                    {"type": "object",
                     "properties": {"id": {"type": "integer"},
                                    "active": {"type": "boolean"}},
                     "required": ["id", "active"]}, tok))))
        print(f"  json: {req.result.text!r}")

        # 4. priorities: CRITICAL jumps the queue
        print("== priorities ==")
        low = [Request(prompt=f"low {i}", priority=RequestPriority.LOW,
                       config=GenerationConfig(max_tokens=8))
               for i in range(4)]
        crit = Request(prompt="critical", priority=RequestPriority.CRITICAL,
                       config=GenerationConfig(max_tokens=8))
        for r in low:
            sched.submit(r)
        sched.submit(crit)
        crit.wait(120)
        print(f"  critical done while {sum(not r.wait(0) for r in low)} "
              f"low-priority still pending")
        for r in low:
            r.wait(120)

        # 4. interactive chat
        if args.interactive:
            print("== chat (ctrl-d to exit) ==")
            history = ""
            while True:
                try:
                    user = input("you> ")
                except EOFError:
                    break
                history += f"User: {user}\nAssistant:"
                req = Request(
                    prompt=history,
                    config=GenerationConfig(max_tokens=64, temperature=0.8,
                                            stop_tokens=("User:",)),
                    stream_callback=lambda d: (
                        sys.stdout.write(d), sys.stdout.flush(), True)[2])
                sched.submit_sync(req)
                history += req.result.text + "\n"
                print()
    finally:
        sched.stop()


if __name__ == "__main__":
    main()
