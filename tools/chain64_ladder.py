#!/usr/bin/env python3
"""Per-stage cost ladder for the chain64 flagship on real TPU.

Builds progressively longer prefixes of the chain64 step and times each,
so the HBM cost of every tail stage is visible. Run through the axon tunnel:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/chain64_ladder.py [log2block]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sdrangel_tpu.dsp import decimators as dec, pfb as pfbmod
from sdrangel_tpu.channels import demod_nfm
from sdrangel_tpu.dsp import (
    firdesign,
    movingavg,
    nco,
    phasediscri,
    resampler,
    squelch,
)

LOG2BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 22
BLOCK = 1 << LOG2BLOCK
LOG2DEC = 2
M = 64
BB = BLOCK >> LOG2DEC
F = BB // M

cfg = demod_nfm.NFMConfig(
    channel_rate=48000.0, block_in=F, squelch_db=-100.0, squelch_gate_ms=1.0
)
residual = np.linspace(-4000.0, 4000.0, M).astype(np.float32)
plan = cfg.resampler_plan
bp_taps = np.asarray(cfg.bandpass_taps)


def upto(stage):
    def step(casc, cstate, dstate, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        casc, bb = dec.decimate_flat_any(casc, x, LOG2DEC, "cen")
        if stage == "decim":
            return casc, cstate, dstate, jnp.stack([bb.real, bb.imag])
        cstate, yall = pfbmod.analyze(cstate, bb, M)
        if stage == "pfb":
            return casc, cstate, dstate, jnp.stack([yall.real, yall.imag])
        y = yall.T
        if stage == "transpose":
            return casc, cstate, dstate, jnp.stack([y.real, y.imag])
        inc = nco.freq_to_increment_traced(-jnp.asarray(residual), cfg.channel_rate)
        nst, xm = nco.mix_block(dstate.nco, y, inc)
        if stage == "mix":
            return casc, cstate, dstate, jnp.stack([xm.real, xm.imag])
        rst, ci = resampler.resample_block(dstate.resamp, xm, plan)
        if stage == "resamp":
            return casc, cstate, dstate, jnp.stack([ci.real, ci.imag])
        dst, demod, magsq = phasediscri.discriminator_delta(
            dstate.discri, ci, cfg.fm_scaling
        )
        if stage == "discri":
            return casc, cstate, dstate, demod + magsq
        mst, avg = movingavg.moving_average(dstate.mavg, magsq)
        if stage == "mavg":
            return casc, cstate, dstate, demod + avg
        sst, gated, is_open = squelch.gate_block(
            dstate.squelch, demod, avg >= 1e-10, cfg.squelch_gate_samples
        )
        if stage == "squelch":
            return casc, cstate, dstate, gated
        bst, audio = firdesign.fir_apply(dstate.bandpass, gated, jnp.asarray(bp_taps))
        return casc, cstate, dstate, audio.astype(jnp.float32)

    return jax.jit(step)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(BLOCK, 2), dtype=np.int16))
    casc = jax.jit(lambda: dec.init_flat_state(LOG2DEC))()
    cstate = jax.jit(lambda: pfbmod.make_state(M))()
    dstate = jax.jit(lambda: demod_nfm.make_state(cfg, (M,)))()

    all_stages = ["decim", "pfb", "transpose", "mix", "resamp", "discri",
                  "mavg", "squelch", "full"]
    stages = sys.argv[2].split(",") if len(sys.argv) > 2 else all_stages
    prev = 0.0
    for stage in stages:
        step = upto(stage)
        t0 = time.time()
        outs = step(casc, cstate, dstate, raw)
        jax.block_until_ready(outs[-1])
        compile_s = time.time() - t0
        # pipelined timing: median of 5 passes of 8 queued steps
        times = []
        for _ in range(5):
            t0 = time.time()
            o = None
            for _ in range(8):
                o = step(casc, cstate, dstate, raw)
            jax.block_until_ready(o[-1])
            times.append((time.time() - t0) / 8)
        dt = float(np.median(times)) * 1e6
        print(f"{stage:10s} compile {compile_s:6.1f}s  step {dt:8.1f} us  "
              f"delta {dt - prev:+8.1f} us  in-GS/s {BLOCK / dt / 1e3:8.1f}",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
