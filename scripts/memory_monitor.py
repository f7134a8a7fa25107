"""Memory time series while serving (reference: scripts/memory_monitor.py —
RSS/pool time series). Samples host RSS + device memory stats."""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sample():
    import jax
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    dev = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        dev = {k: v for k, v in stats.items()
               if k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use")}
    except Exception:
        pass
    return {"t": time.time(), "rss_mb": round(rss_mb, 1), **dev}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--output", default="-")
    args = ap.parse_args()

    out = open(args.output, "w") if args.output != "-" else sys.stdout
    t_end = time.time() + args.duration
    while time.time() < t_end:
        out.write(json.dumps(sample()) + "\n")
        out.flush()
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
