#!/usr/bin/env python3
"""Characterize the tunnel's D2H->H2D direction-switch penalty (probe_product_loop
found: H2D ~1.4 GB/s normally, but ~40 MB/s for the first H2D after any
device->host fetch) and trial the mitigations:

  A. size sweep of the post-fetch H2D (fixed vs proportional cost)
  B. tiny warm-up H2D right after the fetch, then the big one
  C. K-batched session loop: device-side packed outputs, ONE concatenated
     fetch every K blocks -> realtime factor per K

  PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/probe_product_switch.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("DRIVE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

RATE = 10_000_000.0
LOG2 = 6
OFFSET = 20_000.0


def phase_ab():
    print("== A/B: switch penalty ==", flush=True)
    rng = np.random.default_rng(0)
    f = jax.jit(lambda x: (x.astype(jnp.float32).sum(0) * 1e-6))
    pool = rng.integers(-2048, 2048, size=(1 << 24, 2), dtype=np.int16)
    y = f(jax.device_put(pool[:1 << 20]))
    _ = np.asarray(y)
    for n in (1 << 18, 1 << 20, 1 << 22, 10_240_000):
        for warm in (False, True):
            ts = []
            for i in range(4):
                d = jax.device_put(pool[: 1 << 20])
                _ = np.asarray(f(d))          # a D2H: poisons the next H2D
                t0 = time.perf_counter()
                if warm:
                    w = jax.device_put(pool[:1024])
                    w.block_until_ready()
                t_warm = time.perf_counter() - t0
                t1 = time.perf_counter()
                big = jax.device_put(pool[i: i + n])
                big.block_until_ready()
                ts.append((t_warm, time.perf_counter() - t1))
            med_w = np.median([t[0] for t in ts]) * 1e3
            med_b = np.median([t[1] for t in ts]) * 1e3
            mb = n * 4 / 1e6
            print(f"  post-fetch H2D {mb:7.1f} MB warm={int(warm)}: "
                  f"warmup {med_w:7.1f} ms, big {med_b:8.1f} ms "
                  f"({mb / (med_b / 1e3) / 1e3:6.2f} GB/s)", flush=True)


def phase_c():
    print("== C: K-batched session loop ==", flush=True)
    from sdrangel_tpu.runtime.session import DeviceSet

    path = os.path.join(REPO, ".scratch", "probe10m.sdriq")
    ds = DeviceSet(0)
    ds.source.kind = "filesource"
    ds.source.file_path = path
    ds.source.log2_decim = LOG2
    ds.add_channel("sdrangel.channel.nfmdemod", {
        "inputFrequencyOffset": OFFSET, "squelch_db": -100.0})
    pipe, reader = ds._build_pipeline()
    B = pipe.device_block
    state = pipe.init_state()
    dyn = pipe.default_dyn()

    def packed_step(state, raw, dyn):
        state, outs = pipe._step_impl(state, raw, dyn)
        o = outs["channels"][0]
        flat = [o["audio"].ravel(), o["power"].reshape(1),
                outs["spectrum"].ravel(), outs["scope"].ravel()]
        if "squelch" in o:
            flat.append(o["squelch"].astype(jnp.float32).reshape(-1))
        return state, jnp.concatenate([f.astype(jnp.float32) for f in flat])

    pstep = jax.jit(packed_step)
    cat = jax.jit(lambda *xs: jnp.concatenate(xs))
    t0 = time.perf_counter()
    state, pack = pstep(state, jax.device_put(reader(0, B)), dyn)
    jax.block_until_ready(pack)
    print(f"  compile: {time.perf_counter()-t0:.1f}s", flush=True)
    pos = B
    for K in (4, 8, 16):
        laps = []
        for rep in range(3):
            t0 = time.perf_counter()
            packs = []
            for b in range(K):
                raw = reader(pos, B)
                pos += B
                state, pack = pstep(state, jax.device_put(raw), dyn)
                packs.append(pack)
            host = np.asarray(cat(*packs))
            laps.append(time.perf_counter() - t0)
        med = float(np.median(laps))
        print(f"  K={K:2d}: {' '.join(f'{t:6.2f}' for t in laps)} s "
              f"-> rtf {K * B / RATE / med:6.2f} ({len(host)} f32 fetched)",
              flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    phase_ab()
    phase_c()


if __name__ == "__main__":
    main()
