#!/usr/bin/env python3
"""Characterize the permanent H2D degradation: after the process's FIRST
device->host fetch, every host->device transfer drops ~1.4 GB/s -> ~40 MB/s
(probe_product_switch). Matrix:

  1. baseline H2D (fresh process)        — expect fast
  2. taint variants: fetch of a device_put'd array vs a jit output
  3. post-taint recovery: repeats, sleep, gc, jax.clear_caches
  4. post-taint alternatives: dtype f32/i8, chunked async puts,
     make_array_from_callback

  PYTHONPATH=/root/repo:/root/.axon_site timeout 560 python tools/probe_h2d_taint.py
"""

import gc
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

N = 10_240_000
rng = np.random.default_rng(0)
POOL = rng.integers(-2048, 2048, size=(N + 64, 2), dtype=np.int16)


def h2d(n=N, i=0, data=None):
    blk = POOL[i:i + n] if data is None else data
    t0 = time.perf_counter()
    d = jax.device_put(blk)
    d.block_until_ready()
    dt = time.perf_counter() - t0
    mb = blk.nbytes / 1e6
    return dt, mb / dt / 1e3, d


def main():
    print("devices:", jax.devices(), flush=True)
    for i in range(3):
        dt, gbs, d = h2d(i=i)
        print(f"  fresh H2D {i}: {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)

    # taint A: fetch a device_put'd array (no jit involved)
    _ = np.asarray(d[:65536])
    dt, gbs, _ = h2d(i=3)
    print(f"  after passthrough-fetch: {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)",
          flush=True)

    # taint B: fetch a jit output
    f = jax.jit(lambda x: x.astype(jnp.float32) * 2.0)
    y = f(d)
    _ = np.asarray(y[:65536, 0])
    dt, gbs, _ = h2d(i=4)
    print(f"  after jit-output fetch:  {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)",
          flush=True)

    # recovery attempts
    for k in range(4):
        dt, gbs, _ = h2d(i=5 + k)
        print(f"  repeat {k}: {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)
    time.sleep(5.0)
    dt, gbs, _ = h2d(i=9)
    print(f"  after 5 s sleep: {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)
    gc.collect()
    jax.clear_caches()
    dt, gbs, _ = h2d(i=10)
    print(f"  after clear_caches: {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)

    # dtype alternatives
    f32 = (POOL[:N] / 32768.0).astype(np.float32)
    dt, gbs, _ = h2d(data=f32)
    print(f"  f32 (82 MB): {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)
    i8 = (POOL[:N] >> 8).astype(np.int8)
    dt, gbs, _ = h2d(data=i8)
    print(f"  i8  (20 MB): {dt*1e3:7.1f} ms ({gbs:5.2f} GB/s)", flush=True)

    # chunked async puts: issue 16 x 2.56 MB, then block all
    t0 = time.perf_counter()
    parts = [jax.device_put(POOL[j * (N // 16):(j + 1) * (N // 16)])
             for j in range(16)]
    jax.block_until_ready(parts)
    dt = time.perf_counter() - t0
    print(f"  16 async chunks: {dt*1e3:7.1f} ms ({N*4/1e9/dt:5.2f} GB/s)",
          flush=True)

    # make_array_from_callback path (the sharded hostfeed ingest)
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("x",))
    sh = NamedSharding(mesh, P())
    t0 = time.perf_counter()
    arr = jax.make_array_from_callback((N, 2), sh, lambda idx: POOL[:N][idx])
    arr.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"  make_array_from_callback: {dt*1e3:7.1f} ms "
          f"({N*4/1e9/dt:5.2f} GB/s)", flush=True)

    # steady alternating measure (the product pattern), i16 vs i8
    g = jax.jit(lambda x: jnp.stack(
        [x[::421, 0].astype(jnp.float32), x[::421, 1].astype(jnp.float32)]))
    for label, src in (("i16", POOL[:N]), ("i8", i8)):
        ts = []
        for k in range(4):
            t0 = time.perf_counter()
            d = jax.device_put(src[k:] if k else src)
            out = g(d.astype(jnp.int16) if label == "i8" else d)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"  alternating {label}: {med*1e3:7.1f} ms/blk "
              f"(rtf {N/10e6/med:5.2f})", flush=True)


if __name__ == "__main__":
    main()
