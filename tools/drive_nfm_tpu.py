#!/usr/bin/env python3
"""End-to-end verify drive: FM tone through decimate -> channelize -> NFM on
the real TPU; asserts the recovered audio tone frequency and SNR on host.

PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/drive_nfm_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("DRIVE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from sdrangel_tpu.dsp import channelizer as chanmod, decimators as dec
from sdrangel_tpu.channels import demod_nfm


def main():
    print("devices:", jax.devices(), flush=True)
    device_rate = 3_072_000.0
    log2 = 4  # /16 -> 192 kHz baseband
    bb_rate = device_rate / (1 << log2)
    offset = 24_000.0  # channel sits at +24 kHz in the baseband
    plan = chanmod.plan_channel(bb_rate, 32_000.0, offset)
    chan_rate = plan.channel_rate
    print("plan:", plan, flush=True)

    block = 1 << 18
    cfg = demod_nfm.NFMConfig(
        channel_rate=chan_rate,
        input_offset=plan.residual_offset,
        audio_rate=48_000.0,
        fm_deviation=3_000.0,
        squelch_db=-60.0,
        squelch_gate_ms=1.0,
        block_in=int(block >> log2 >> len(plan.signs)),
    )

    # FM: 1 kHz tone, 3 kHz deviation, carrier at +24 kHz of device rate/16.
    # Generated CONTINUOUS over all blocks — repeating one block would put
    # an FM phase seam at every boundary and splatter the audio spectrum.
    n_blocks = 3
    n = np.arange(block * n_blocks)
    inst = 3_000.0 * np.cos(2 * np.pi * 1_000.0 * n / device_rate) + offset
    phase = np.cumsum(2 * np.pi * inst / device_rate)
    iq = 0.4 * np.exp(1j * phase)
    # interferer far out of band
    iq += 0.2 * np.exp(2j * np.pi * 0.23 * n)

    signs = np.array([plan.signs])

    def step(casc, cst, dst, x2):
        x = (x2[:, 0] + 1j * x2[:, 1]).astype(jnp.complex64)
        casc, bb = dec.decimate_cascade(casc, x, log2, "cen")
        cst, y = chanmod.channelize_bank_unique(cst, bb, signs)
        dst, audio = demod_nfm.process(dst, y[0], cfg)
        return casc, cst, dst, audio.astype(jnp.float32)

    jstep = jax.jit(step)
    casc = jax.jit(lambda: dec.init_state(log2))()
    cst = jax.jit(lambda: chanmod.init_state(len(plan.signs), (1,)))()
    dst = jax.jit(lambda: demod_nfm.make_state(cfg))()

    t0 = time.time()
    audio_blocks = []
    for i in range(n_blocks):
        seg = iq[i * block:(i + 1) * block]
        raw = np.stack([seg.real, seg.imag], axis=1).astype(np.float32)
        casc, cst, dst, audio = jstep(casc, cst, dst, jnp.asarray(raw))
        audio_blocks.append(np.asarray(audio))
        print(f"block {i} done t={time.time()-t0:.1f}s", flush=True)
    audio = np.concatenate(audio_blocks)[cfg.block_in:]  # skip warmup block

    # assert: dominant audio frequency is 1 kHz, strong vs the rest
    w = np.abs(np.fft.rfft(audio * np.hanning(len(audio)))) ** 2
    freqs = np.fft.rfftfreq(len(audio), 1 / 48_000.0)
    peak = freqs[np.argmax(w[5:])] if False else freqs[np.argmax(w)]
    inband = w[(freqs > 900) & (freqs < 1100)].sum()
    total = w[(freqs > 100)].sum()
    snr = 10 * np.log10(inband / max(total - inband, 1e-30))
    print(f"audio rms {np.sqrt(np.mean(audio**2)):.4f} peak {peak:.1f} Hz "
          f"snr {snr:.1f} dB", flush=True)
    top = np.argsort(w)[-8:][::-1]
    for i in top:
        print(f"  f={freqs[i]:8.1f} p={10*np.log10(w[i]+1e-30):6.1f}", flush=True)
    dump = os.environ.get("DRIVE_DUMP")
    if dump:
        np.save(dump, audio)
    ref_path = os.environ.get("DRIVE_REF")
    if ref_path:
        ref = np.load(ref_path)
        n2 = min(len(ref), len(audio))
        d = audio[:n2] - ref[:n2]
        print(f"vs ref: max|d| {np.max(np.abs(d)):.5f} rms(d) "
              f"{np.sqrt(np.mean(d**2)):.5f}", flush=True)
        # where does the difference live in time?
        seg = n2 // 12
        for k in range(12):
            r = np.sqrt(np.mean(d[k*seg:(k+1)*seg]**2))
            print(f"  seg {k}: rms(d) {r:.5f}", flush=True)
    assert abs(peak - 1_000.0) < 20.0, peak
    assert snr > 20.0, snr
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
