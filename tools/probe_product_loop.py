#!/usr/bin/env python3
"""Product-loop bisection #2: the stages are sub-ms alone but the session
block costs ~1.1-2 s. Instrument the exact session loop leg by leg with
fresh data per block, then try fetch-reduction strategies.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/probe_product_loop.py
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


def main():
    print("devices:", jax.devices(), flush=True)
    from sdrangel_tpu.io import sdriq
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
    print(f"device_block={B}", flush=True)
    state = pipe.init_state()
    dyn = pipe.default_dyn()

    t0 = time.perf_counter()
    raw = reader(0, B)
    state, outs = pipe._step(state, jnp.asarray(raw), dyn)
    jax.block_until_ready(outs["channels"][0]["audio"])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    # A: loop with NO fetch at all (block_until_ready on audio only)
    pos = B
    for mode in ("nofetch", "nodyn", "audio", "all", "scalar"):
        ts = []
        for b in range(6):
            t0 = time.perf_counter()
            raw = reader(pos, B)
            pos += B
            d = jax.device_put(raw)
            state, outs = pipe._step(state, d, None if mode == "nodyn" else dyn)
            if mode in ("nofetch", "nodyn"):
                jax.block_until_ready(outs["channels"][0]["audio"])
            elif mode == "audio":
                _ = np.asarray(outs["channels"][0]["audio"])
            elif mode == "scalar":
                jax.block_until_ready(outs["channels"][0]["audio"])
                _ = float(outs["channels"][0]["power"])
            else:  # all — what _publish_block fetches
                _ = np.asarray(outs["channels"][0]["audio"])
                _ = float(outs["channels"][0]["power"])
                _ = np.asarray(outs["spectrum"])
                _ = np.asarray(outs["scope"])
                o = outs["channels"][0]
                if "squelch" in o:
                    _ = bool(np.asarray(o["squelch"]))
            ts.append(time.perf_counter() - t0)
        print(f"  {mode:8s}: " + " ".join(f"{t*1e3:7.1f}" for t in ts) + " ms",
              flush=True)

    # B: per-leg timing of the 'all' mode
    for b in range(4):
        t0 = time.perf_counter()
        raw = reader(pos, B)
        pos += B
        t1 = time.perf_counter()
        d = jax.device_put(raw)
        d.block_until_ready()
        t2 = time.perf_counter()
        state, outs = pipe._step(state, d, dyn)
        t3 = time.perf_counter()
        jax.block_until_ready(outs)
        t4 = time.perf_counter()
        a = np.asarray(outs["channels"][0]["audio"])
        t5 = time.perf_counter()
        p = float(outs["channels"][0]["power"])
        t6 = time.perf_counter()
        sp = np.asarray(outs["spectrum"])
        t7 = time.perf_counter()
        sc = np.asarray(outs["scope"])
        t8 = time.perf_counter()
        print(f"  leg blk{b}: read {1e3*(t1-t0):6.1f} h2d {1e3*(t2-t1):6.1f} "
              f"disp {1e3*(t3-t2):6.1f} wait {1e3*(t4-t3):7.1f} "
              f"audio {1e3*(t5-t4):7.1f} power {1e3*(t6-t5):7.1f} "
              f"spec {1e3*(t7-t6):6.1f} scope {1e3*(t8-t7):6.1f}", flush=True)

    # C: packed single-fetch wrapper — everything the publish needs in ONE
    # f32 array from the same jit
    def packed_step(state, raw, dyn):
        state, outs = pipe._step_impl(state, raw, dyn)
        o = outs["channels"][0]
        flat = [o["audio"].ravel(),
                o["power"].reshape(1),
                outs["spectrum"].ravel(),
                outs["scope"].ravel()]
        if "squelch" in o:
            flat.append(o["squelch"].astype(jnp.float32).reshape(-1))
        return state, jnp.concatenate([f.astype(jnp.float32) for f in flat])

    pstep = jax.jit(packed_step)
    t0 = time.perf_counter()
    state, pack = pstep(state, jax.device_put(reader(pos, B)), dyn)
    pos += B
    jax.block_until_ready(pack)
    print(f"  packed compile: {time.perf_counter()-t0:.1f}s", flush=True)
    for b in range(6):
        t0 = time.perf_counter()
        raw = reader(pos, B)
        pos += B
        state, pack = pstep(state, jax.device_put(raw), dyn)
        t1 = time.perf_counter()
        host = np.asarray(pack)
        t2 = time.perf_counter()
        print(f"  packed blk{b}: dispatch {1e3*(t1-t0):6.1f} "
              f"fetch {1e3*(t2-t1):7.1f} total {1e3*(t2-t0):7.1f} ms "
              f"(rtf {B/RATE/(t2-t0):6.2f})", flush=True)


if __name__ == "__main__":
    main()
