#!/usr/bin/env python3
"""Compile/runtime cost of saturating_counter formulations on TPU.

The chain64 squelch rung compiled in 66 s at (64, 16384) and >9 min at
(64, 65536) — bisecting the associative_scan layout hypothesis:
stride-2 slicing along the minor (lane) axis forces a Mosaic relayout per
stage; scanning along a major axis should not.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_scan.py [log2 ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def compose(f, g):
    af, lf, hf = f
    ag, lg, hg = g
    return af + ag, jnp.clip(lf + ag, lg, hg), jnp.clip(hf + ag, lg, hg)


def sat_minor(deltas, lo, hi, init):
    a = deltas.astype(jnp.float32)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))
    aa, ll, hh = jax.lax.associative_scan(compose, (a, l, h), axis=-1)
    return jnp.clip(init[..., None] + aa, ll, hh)


def sat_major(deltas, lo, hi, init):
    a = jnp.moveaxis(deltas.astype(jnp.float32), -1, 0)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))
    aa, ll, hh = jax.lax.associative_scan(compose, (a, l, h), axis=0)
    out = jnp.clip(init[None] + aa, ll, hh)
    return jnp.moveaxis(out, 0, -1)


def sat_2level(deltas, lo, hi, init, k=512):
    *b, t = deltas.shape
    c = t // k
    a = deltas.astype(jnp.float32).reshape(*b, c, k)
    a = jnp.moveaxis(a, -1, 0)  # (K, ..., C)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))
    aa, ll, hh = jax.lax.associative_scan(compose, (a, l, h), axis=0)
    # chunk-total triples: last element over K -> (..., C), scan over C
    ct = (jnp.moveaxis(aa[-1], -1, 0), jnp.moveaxis(ll[-1], -1, 0),
          jnp.moveaxis(hh[-1], -1, 0))  # (C, ...)
    pa, plo, phi = jax.lax.associative_scan(compose, ct, axis=0)
    # exclusive prefix: shift by one chunk, identity for chunk 0
    z = jnp.zeros_like(pa[:1])
    ident_l = jnp.full_like(z, -np.inf)
    ident_h = jnp.full_like(z, np.inf)
    pa = jnp.concatenate([z, pa[:-1]])
    plo = jnp.concatenate([ident_l, plo[:-1]])
    phi = jnp.concatenate([ident_h, phi[:-1]])
    s0 = jnp.clip(init[None] + pa, plo, phi)  # (C, ...) count entering chunk
    s0 = jnp.moveaxis(s0, 0, -1)  # (..., C)
    out = jnp.clip(s0[None] + aa, ll, hh)  # (K, ..., C)
    out = jnp.moveaxis(out, 0, -1)  # (..., C, K)
    return out.reshape(*b, t)


def main():
    print("devices:", jax.devices(), flush=True)
    log2s = [int(v) for v in sys.argv[1:]] or [14, 17]
    rng = np.random.default_rng(0)
    for name, fn in [("minor", sat_minor), ("major", sat_major),
                     ("2level", sat_2level)]:
        for lg in log2s:
            t = 1 << lg
            deltas = jnp.asarray(rng.choice([-1.0, 1.0], size=(64, t)).astype(np.float32))
            init = jnp.zeros((64,), jnp.float32)
            f = jax.jit(lambda d, i: fn(d, 0.0, 96.0, i))
            t0 = time.time()
            out = f(deltas, init)
            out.block_until_ready()
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(8):
                    out = f(deltas, init)
                out.block_until_ready()
                times.append((time.time() - t0) / 8)
            print(f"{name:7s} T=2^{lg}  compile {compile_s:6.1f}s  "
                  f"step {np.median(times)*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
