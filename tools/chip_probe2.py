#!/usr/bin/env python3
"""Chip calibration with CHAINED iterations (output feeds next input).

tools/chip_probe.py repeated the identical execution and read 20 TB/s /
47 Pflop/s — the tunnel runtime services repeated identical executables
without re-running them. Chaining the value through the loop forces real
execution (the same reason bench.py's numbers are real: its carried
states differ every step).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_probe2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit_chain(f, x0, iters=16, passes=5):
    x = f(x0)
    jax.block_until_ready(x)
    times = []
    for _ in range(passes):
        x = x0
        t0 = time.time()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        times.append((time.time() - t0) / iters)
    return float(np.median(times))


def main():
    print("devices:", jax.devices(), flush=True)
    n = 1 << 26  # 64M f32 = 256 MB
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    f = jax.jit(lambda v: v * 1.0000001 + 1.0)
    dt = timeit_chain(f, x)
    print(f"chained copy 256MB: {dt*1e6:8.1f} us -> {2 * 4 * n / dt / 1e9:7.1f} GB/s",
          flush=True)

    k = 4096
    # NEVER close over a device array in a jit (dispatch-poisoning rule,
    # CLAUDE.md #1) — the weight matrix is a call argument.
    bnp = np.random.default_rng(2).standard_normal((k, k)).astype(np.float32)
    for dtype, prec, tag in [
        (jnp.bfloat16, None, "bf16"),
        (jnp.float32, jax.lax.Precision.DEFAULT, "f32-default"),
        (jnp.float32, jax.lax.Precision.HIGH, "f32-high"),
        (jnp.float32, jax.lax.Precision.HIGHEST, "f32-highest"),
    ]:
        a0 = jnp.asarray(
            np.random.default_rng(1).standard_normal((k, k)).astype(np.float32)
        ).astype(dtype)
        bdev = jnp.asarray(bnp).astype(dtype)
        if prec is None:
            f2 = jax.jit(lambda u, w: jnp.dot(
                u, w, preferred_element_type=jnp.float32).astype(u.dtype) * 1e-3)
        else:
            f2 = jax.jit(lambda u, w, p=prec: jnp.dot(
                u, w, precision=p,
                preferred_element_type=jnp.float32).astype(u.dtype) * 1e-3)
        f = lambda u, f2=f2, w=bdev: f2(u, w)
        dt = timeit_chain(f, a0, iters=8)
        print(f"chained matmul {k}^3 {tag:12s}: {dt*1e6:8.1f} us -> "
              f"{2 * k**3 / dt / 1e12:7.2f} Tflop/s", flush=True)


if __name__ == "__main__":
    main()
