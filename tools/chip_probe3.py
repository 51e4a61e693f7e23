#!/usr/bin/env python3
"""Does per-step time converge as the chained loop gets longer?

If block_until_ready under-waits but the execution queue is bounded, short
loops measure the dispatch floor and long loops converge to the true
per-step cost. Sweep iters for the 256 MB copy and a 4096^3 bf16 matmul.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_probe3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sweep(f, x0, iters_list):
    x = f(x0)
    jax.block_until_ready(x)
    for iters in iters_list:
        x = x0
        t0 = time.time()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        dt = (time.time() - t0) / iters
        yield iters, dt


def main():
    print("devices:", jax.devices(), flush=True)
    n = 1 << 26
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    f = jax.jit(lambda v: v * 1.0000001 + 1.0)
    for iters, dt in sweep(f, x, [8, 32, 128, 512]):
        print(f"copy 256MB   iters={iters:4d}: {dt*1e6:8.1f} us/step -> "
              f"{2 * 4 * n / dt / 1e9:8.1f} GB/s", flush=True)

    k = 4096
    b = jnp.asarray(np.random.default_rng(2).standard_normal((k, k)).astype(np.float32)).astype(jnp.bfloat16)
    a0 = jnp.asarray(np.random.default_rng(1).standard_normal((k, k)).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jax.jit(lambda u, w: jnp.dot(u, w, preferred_element_type=jnp.float32)
                 .astype(u.dtype) * 1e-3)
    g = lambda u: f2(u, b)
    for iters, dt in sweep(g, a0, [8, 32, 128, 512]):
        print(f"matmul bf16  iters={iters:4d}: {dt*1e6:8.1f} us/step -> "
              f"{2 * k**3 / dt / 1e12:8.2f} Tflop/s", flush=True)


if __name__ == "__main__":
    main()
