#!/usr/bin/env python3
"""Run several bench configurations in ONE process (one tunnel claim) —
successive TPU processes each pay a multi-minute chip-grant cooldown, so
A/B sweeps must share the jax client.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_multi.py \
    "chain64:22" "chain64:23" "chain64:24" "chain:24"
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    specs = sys.argv[1:] or ["chain64:22", "chain64:23", "chain64:24", "chain:24"]
    import bench

    for spec in specs:
        test, _, l2b = spec.partition(":")
        os.environ["SDRANGEL_BENCH_LOG2BLOCK"] = l2b or "24"
        sys.argv = ["bench.py", "-t", test]
        t0 = time.time()
        print(f"### {spec}", flush=True)
        try:
            bench.main()
        except Exception as e:  # keep going — later specs still measure
            print(f"### {spec} FAILED: {type(e).__name__}: {e}", flush=True)
        print(f"### {spec} wall {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
