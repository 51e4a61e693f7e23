"""Decimator bench sweep: placement (cen/inf/sup) × log2 decimation 1..6.

The reference's sdrangelbench measures exactly this grid single-core
(sdrbench/mainbench.cpp testDecimate{II,InfII,SupII}, parserbench log2 0-6);
here each cell is the flat composed-filter kernel on the accelerator.

Usage: python tools/bench_sweep.py [--log2block 23] [--iters 20]
Prints a JSON object per cell plus a final summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2block", type=int, default=23)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdrangel_tpu.dsp import decimators as dec

    block = 1 << args.log2block
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(2, block), dtype=np.int16))

    results = {}
    for fc_pos in ("cen", "inf", "sup"):
        for log2 in range(1, 7):
            def step(st, lanes, log2=log2, fc_pos=fc_pos):
                x = lanes.astype(jnp.float32) * (1.0 / 32768.0)
                xc = (x[0] + 1j * x[1]).astype(jnp.complex64)
                st, y = dec.decimate_flat_any(st, xc, log2, fc_pos)
                return st, jnp.stack([jnp.real(y), jnp.imag(y)])

            st = jax.jit(lambda log2=log2: dec.init_flat_state(log2))()
            stepj = jax.jit(step)
            st, y = stepj(st, raw)
            jax.block_until_ready(y)
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, y = stepj(st, raw)
                jax.block_until_ready(y)
                dt = time.perf_counter() - t0
                best = max(best, block * args.iters / dt / 1e9)
            results[f"{fc_pos}/{1 << log2}"] = round(best, 1)
            print(json.dumps({"placement": fc_pos, "decim": 1 << log2,
                              "gsps": round(best, 1)}), flush=True)
    print(json.dumps({"sweep": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
