#!/usr/bin/env python3
"""The VERDICT r4 #1 drive: the ACTUAL session worker (runtime/session.py)
at 10 MS/s /64 -> NFM -> audio on the real TPU, with the r5 packed/batched
publish. Records sustained realtime_factor for BENCH_NOTES_r05.

Configs: i16 .sdriq (the reference's own format, H2D 40 MB/s wall after
the first fetch — tools/probe_h2d_taint.py) and a cu8 raw capture (8-bit
ADC width, half the wire bytes).

  PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/drive_session_realtime.py
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

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

SCRATCH = os.path.join(REPO, ".scratch")
RATE = 10_000_000.0
OFFSET = 20_000.0
TONE = 1_000.0


def make_files():
    from sdrangel_tpu.io import sdriq

    n = 10_240_000
    t = np.arange(n, dtype=np.float64) / RATE
    inst = OFFSET + 3000.0 * np.cos(2 * np.pi * TONE * t)
    phase = np.cumsum(2 * np.pi * inst / RATE)
    c = 0.5 * np.exp(1j * phase)
    p16 = os.path.join(SCRATCH, "probe10m.sdriq")
    if not os.path.exists(p16):
        iq = np.empty((n, 2), np.int16)
        iq[:, 0] = np.clip(c.real * 32768.0, -32768, 32767)
        iq[:, 1] = np.clip(c.imag * 32768.0, -32768, 32767)
        w = sdriq.SdriqWriter(p16, sample_rate=int(RATE), center_frequency=0)
        w.write(iq)
        w.close()
    p8 = os.path.join(SCRATCH, "probe10m.cu8")
    if not os.path.exists(p8):
        u8 = np.empty((n, 2), np.uint8)
        u8[:, 0] = np.clip(c.real * 128.0 + 127.4, 0, 255)
        u8[:, 1] = np.clip(c.imag * 128.0 + 127.4, 0, 255)
        with open(p8, "wb") as f:
            f.write(u8.tobytes())
    return p16, p8


def run(path, label, n_blocks, publish_every, extra=None):
    from sdrangel_tpu.runtime.session import DeviceSet

    print(f"== {label} (publish_every={publish_every}) ==", flush=True)
    ds = DeviceSet(0)
    st = {"kind": "filesource", "file_path": path, "log2_decim": 6,
          "throttle": False, "run_blocks": n_blocks,
          "publish_every": publish_every, "sample_rate": RATE}
    st.update(extra or {})
    ds.update_source(st)
    ds.add_channel("sdrangel.channel.nfmdemod", {
        "inputFrequencyOffset": OFFSET, "squelch_db": -100.0})
    t0 = time.perf_counter()
    ds.start()
    last, factors = -1, []
    while ds.running and time.perf_counter() - t0 < 400:
        time.sleep(0.25)
        if ds.blocks_processed != last and ds.realtime_factor > 0:
            last = ds.blocks_processed
            factors.append(ds.realtime_factor)
            print(f"  t={time.perf_counter()-t0:6.1f}s blocks={last:3d} "
                  f"rtf={ds.realtime_factor:6.2f}", flush=True)
    ds.stop()
    if ds.error:
        print(f"  ERROR: {ds.error}", flush=True)
        return None
    wall = time.perf_counter() - t0
    # steady state: skip the first (compile) burst
    steady = factors[1:] or factors
    med = float(np.median(steady))
    # audio sanity
    a = ds.drain_audio(0)
    snr = None
    if len(a) > 48000:
        aa = a[48000:] - a[48000:].mean()
        sp = np.abs(np.fft.rfft(aa * np.hanning(len(aa)))) ** 2
        f = np.fft.rfftfreq(len(aa), 1 / 48000.0)
        snr = 10 * np.log10(sp[np.abs(f - TONE) < 50].sum()
                            / sp[(f > 100) & (np.abs(f - TONE) >= 50)].sum())
    print(f"  {label}: {last} blocks in {wall:.1f}s, median steady rtf "
          f"{med:.2f} (all: {' '.join(f'{x:.2f}' for x in factors)}), "
          f"audio SNR {snr if snr is None else round(snr, 1)} dB", flush=True)
    return med


def main():
    print("devices:", jax.devices(), flush=True)
    p16, p8 = make_files()
    # preload FIRST: its one-time upload runs at full H2D bandwidth only
    # before the process's first fetch (tools/probe_h2d_taint.py)
    run(p16, "i16 sdriq PRELOADED 10 MS/s /64 NFM", 40, 4,
        {"file_preload": True})
    run(p16, "i16 sdriq streaming pub8", 32, 8)
    run(p16, "i16 sdriq streaming pub16", 32, 16)
    run(p8, "cu8 raw streaming", 24, 4)


if __name__ == "__main__":
    main()
