#!/usr/bin/env python3
"""Product-path probe (VERDICT r4 next #1): measure the ACTUAL session
worker — filesource .sdriq at 10 MS/s, ÷64 device cascade, NFM channel,
audio egress + reports — on the real TPU, plus the transfer micro-probes
needed to attribute whatever keeps it under realtime.

Phases (each prints incrementally; survive a timeout):
  A. H2D bandwidth: device_put of DISTINCT int16 blocks (dedup-proof).
  B. D2H: per-fetch cost of f32 jit outputs at several sizes.
  C. The real DeviceSet worker (runtime/session.py), throttle off,
     run_blocks capped; polls realtime_factor.
  D. Instrumented manual loop over the same RxPipeline: reader / H2D /
     step-dispatch / publish-fetch per block.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/probe_product_path.py
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

SCRATCH = os.path.join(REPO, ".scratch")
os.makedirs(SCRATCH, exist_ok=True)

RATE = 10_000_000.0
LOG2 = 6
OFFSET = 20_000.0
TONE = 1_000.0
DEV = 3_000.0


def phase_a_h2d():
    print("== A: H2D ==", flush=True)
    rng = np.random.default_rng(0)
    for n in (1 << 20, 1 << 22, 10_240_000, 1 << 24):
        reps = 6
        pool = rng.integers(-2048, 2048, size=(n + reps, 2), dtype=np.int16)
        ts = []
        for i in range(reps):
            blk = np.ascontiguousarray(pool[i:i + n])  # distinct data each rep
            t0 = time.perf_counter()
            y = jax.device_put(blk)
            y.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del y
        ts = sorted(ts)[1:-1]
        mb = n * 4 / 1e6
        med = float(np.median(ts))
        print(f"  H2D {n:>9d} smp ({mb:7.1f} MB): med {med*1e3:8.1f} ms "
              f"-> {mb/1e3/med:7.2f} GB/s  (all: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)


def phase_b_d2h():
    print("== B: D2H ==", flush=True)
    # carried-state jit so repeated calls are distinct work; fetch outputs
    @jax.jit
    def gen(x):
        x = x * 1.000001 + 1e-7
        return x, (x[:1024], x[:65536], x[:1 << 20])

    x = jax.device_put(np.ones((1 << 20,), np.float32))
    x, outs = gen(x)
    jax.block_until_ready(outs)
    for k, label in ((0, "1k"), (1, "64k"), (2, "1M")):
        ts = []
        for _ in range(6):
            x, outs = gen(x)
            outs[2].block_until_ready()
            t0 = time.perf_counter()
            _ = np.asarray(outs[k])
            ts.append(time.perf_counter() - t0)
        med = float(np.median(sorted(ts)[1:-1]))
        print(f"  D2H {label:>4}: med {med*1e3:8.2f} ms (all: "
              + " ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)


def make_file(path: str, n: int):
    """Phase-continuous FM tone file: carrier 20 kHz, 1 kHz tone, 3 kHz
    deviation; n chosen so the content is continuous when read_block wraps."""
    from sdrangel_tpu.io import sdriq

    if os.path.exists(path) and sdriq.read_header(path).n_samples == n:
        return
    t = np.arange(n, dtype=np.float64) / RATE
    inst = OFFSET + DEV * np.cos(2 * np.pi * TONE * t)
    phase = np.cumsum(2 * np.pi * inst / RATE)
    c = 0.5 * np.exp(1j * phase)
    iq = np.empty((n, 2), np.int16)
    iq[:, 0] = np.clip(c.real * 32768.0, -32768, 32767)
    iq[:, 1] = np.clip(c.imag * 32768.0, -32768, 32767)
    w = sdriq.SdriqWriter(path, sample_rate=int(RATE), center_frequency=0)
    w.write(iq)
    w.close()
    print(f"  wrote {path}: {n} samples @ {RATE:.0f}", flush=True)


def phase_c_session(path: str, n_blocks: int):
    print("== C: session worker ==", flush=True)
    from sdrangel_tpu.runtime.session import DeviceSet

    ds = DeviceSet(0)
    ds.source.kind = "filesource"
    ds.source.file_path = path
    ds.source.log2_decim = LOG2
    ds.source.throttle = False
    ds.source.run_blocks = n_blocks
    ds.add_channel("sdrangel.channel.nfmdemod", {
        "inputFrequencyOffset": OFFSET, "squelch_db": -100.0,
        "audioFile": os.path.join(SCRATCH, "probe_audio.wav"),
    })
    t0 = time.perf_counter()
    ds.start()
    last = -1
    factors = []
    while ds.running and time.perf_counter() - t0 < 420:
        time.sleep(0.25)
        if ds.blocks_processed != last:
            last = ds.blocks_processed
            factors.append((time.perf_counter() - t0, last, ds.realtime_factor))
            print(f"  t={factors[-1][0]:7.1f}s blocks={last:3d} "
                  f"rtf={ds.realtime_factor:7.2f}", flush=True)
    ds.stop()
    if ds.error:
        print(f"  ERROR: {ds.error}", flush=True)
        return
    wall = time.perf_counter() - t0
    print(f"  total: {last} blocks in {wall:.1f}s", flush=True)
    # audio sanity: tone SNR of the written wav (skip first block = compile)
    import wave
    with wave.open(os.path.join(SCRATCH, "probe_audio.wav"), "rb") as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    a = pcm[48000:].astype(np.float64) / 32768.0
    if len(a) > 48000:
        win = np.hanning(len(a))
        spec = np.abs(np.fft.rfft(a * win)) ** 2
        f = np.fft.rfftfreq(len(a), 1 / 48000.0)
        sig = spec[np.abs(f - TONE) < 50.0].sum()
        noise = spec[(f > 100) & (np.abs(f - TONE) >= 50)].sum()
        print(f"  audio tone SNR: {10*np.log10(sig/max(noise,1e-30)):.1f} dB "
              f"({len(a)} samples)", flush=True)


def phase_d_manual(path: str, n_blocks: int):
    print("== D: instrumented loop ==", flush=True)
    from sdrangel_tpu.runtime.session import DeviceSet

    ds = DeviceSet(0)
    ds.source.kind = "filesource"
    ds.source.file_path = path
    ds.source.log2_decim = LOG2
    ds.source.throttle = False
    ds.add_channel("sdrangel.channel.nfmdemod", {
        "inputFrequencyOffset": OFFSET, "squelch_db": -100.0})
    pipe, reader = ds._build_pipeline()
    print(f"  base_block={pipe.base_block} device_block={pipe.device_block} "
          f"({pipe.device_block/RATE*1e3:.0f} ms of signal, "
          f"{pipe.device_block*4/1e6:.1f} MB)", flush=True)
    state = pipe.init_state()
    dyn = pipe.default_dyn()
    t0 = time.perf_counter()
    raw = reader(0, pipe.device_block)
    state, outs = pipe._step(state, jnp.asarray(raw), dyn)
    jax.block_until_ready(outs["channels"][0]["audio"])
    print(f"  compile+first-step: {time.perf_counter()-t0:.1f}s", flush=True)
    pos = pipe.device_block
    prev = None
    for b in range(n_blocks):
        t0 = time.perf_counter()
        raw = reader(pos, pipe.device_block)
        t1 = time.perf_counter()
        draw = jnp.asarray(raw)
        t2 = time.perf_counter()
        state, outs = pipe._step(state, draw, dyn)
        t3 = time.perf_counter()
        # publish the PREVIOUS block (one-behind, as the worker does)
        pub = 0.0
        if prev is not None:
            tp = time.perf_counter()
            _ = np.asarray(prev["channels"][0]["audio"])
            _ = float(prev["channels"][0]["power"])
            _ = np.asarray(prev["spectrum"])
            _ = np.asarray(prev["scope"])
            pub = time.perf_counter() - tp
        prev = outs
        t4 = time.perf_counter()
        pos += pipe.device_block
        print(f"  blk {b}: read {1e3*(t1-t0):6.1f} h2d {1e3*(t2-t1):6.1f} "
              f"dispatch {1e3*(t3-t2):6.1f} publish {1e3*pub:6.1f} "
              f"total {1e3*(t4-t0):7.1f} ms "
              f"(rtf {pipe.device_block/RATE/(t4-t0):5.2f})", flush=True)
    # tail: wait for last block, separating compute wait
    t0 = time.perf_counter()
    jax.block_until_ready(prev["channels"][0]["audio"])
    print(f"  final drain: {1e3*(time.perf_counter()-t0):.1f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    phase_a_h2d()
    phase_b_d2h()
    path = os.path.join(SCRATCH, "probe10m.sdriq")
    # 10.24 Ms = 1.024 s: carrier 20 kHz * 1.024 s = 20480 cycles (integer)
    # and tone 1 kHz * 1.024 s = 1024 cycles -> phase-continuous wrap
    make_file(path, 10_240_000)
    phase_d_manual(path, 8)
    phase_c_session(path, 12)


if __name__ == "__main__":
    main()
