#!/usr/bin/env python3
"""Calibrate the attached TPU: HBM copy bandwidth and MXU matmul rate.

All perf modeling (bench roofline sanity checks, DFT precision choice for
the chain64 PFB) keys off these two numbers, not the nameplate of whatever
"TPU v5 lite" the tunnel exposes.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(f, *args, iters=8, passes=5):
    out = f(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(passes):
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        times.append((time.time() - t0) / iters)
    return float(np.median(times))


def main():
    print("devices:", jax.devices(), flush=True)
    # HBM copy: read N + write N bytes
    n = 1 << 26  # 64M f32 = 256 MB
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    f = jax.jit(lambda v: v * 1.0000001 + 1.0)
    dt = timeit(f, x)
    print(f"copy 256MB: {dt*1e6:8.1f} us -> {2 * 4 * n / dt / 1e9:7.1f} GB/s", flush=True)

    # MXU: square matmuls
    for dtype, prec, tag in [
        (jnp.bfloat16, None, "bf16"),
        (jnp.float32, jax.lax.Precision.DEFAULT, "f32-default"),
        (jnp.float32, jax.lax.Precision.HIGH, "f32-high"),
        (jnp.float32, jax.lax.Precision.HIGHEST, "f32-highest"),
    ]:
        k = 8192
        a = jnp.asarray(np.random.default_rng(1).standard_normal((k, k)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(np.random.default_rng(2).standard_normal((k, k)).astype(np.float32)).astype(dtype)
        if prec is None:
            f = jax.jit(lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32))
        else:
            f = jax.jit(lambda u, v, p=prec: jnp.dot(u, v, precision=p,
                                                     preferred_element_type=jnp.float32))
        dt = timeit(f, a, b, iters=4)
        print(f"matmul {k}^3 {tag:12s}: {dt*1e6:8.1f} us -> "
              f"{2 * k**3 / dt / 1e12:7.1f} Tflop/s", flush=True)

    # skinny matmul shaped like the chain64 partial DFT: (F, 512) @ (512, 128)
    for fdim in (16384, 65536):
        a = jnp.asarray(np.random.default_rng(3).standard_normal((fdim, 512)).astype(np.float32))
        b = jnp.asarray(np.random.default_rng(4).standard_normal((512, 128)).astype(np.float32))
        for prec, tag in [(jax.lax.Precision.DEFAULT, "f32-default"),
                          (jax.lax.Precision.HIGH, "f32-high")]:
            f = jax.jit(lambda u, v, p=prec: jnp.dot(u, v, precision=p))
            dt = timeit(f, a, b)
            print(f"dft-matmul ({fdim},512)@(512,128) {tag:12s}: {dt*1e6:8.1f} us -> "
                  f"{2 * fdim * 512 * 128 / dt / 1e12:6.2f} Tflop/s", flush=True)


if __name__ == "__main__":
    main()
