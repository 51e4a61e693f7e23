#!/usr/bin/env python3
"""Per-stage cost ladder for the r3 chain64 flagship (PFB-256 at device
rate) on real TPU.

Each rung jits a progressively longer prefix of the bench.py chain64 step
and times it pipelined, so every tail stage's HBM cost is visible.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/chain64_ladder256.py [log2block] [stages]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sdrangel_tpu.dsp import pfb as pfbmod
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
M = 256
NCH = 64
F = BLOCK // M

cfg = demod_nfm.NFMConfig(
    channel_rate=48000.0, block_in=F, squelch_db=-100.0, squelch_gate_ms=1.0
)
residual = np.linspace(-4000.0, 4000.0, NCH).astype(np.float32)
plan = cfg.resampler_plan
bp_taps = np.asarray(cfg.bandpass_taps)


def upto(stage):
    def step(cstate, dstate, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        if stage == "convert":
            return cstate, dstate, jnp.stack([x.real, x.imag])
        cstate, yall = pfbmod.analyze(cstate, x, M)
        if stage == "pfb":
            return cstate, dstate, jnp.stack([yall.real, yall.imag])
        # slice+concat band select — keep in lockstep with bench.py's
        # chain64 step (the gather form it replaced costs a TPU relayout
        # the shipped chain no longer pays)
        half = NCH // 2
        y = jnp.concatenate([yall[..., M - half:], yall[..., :half]], axis=-1)
        y = jnp.moveaxis(y, -1, 0)
        if stage == "select":
            return cstate, dstate, jnp.stack([y.real, y.imag])
        inc = nco.freq_to_increment_traced(-jnp.asarray(residual), cfg.channel_rate)
        nst, xm = nco.mix_block(dstate.nco, y, inc)
        if stage == "mix":
            return cstate, dstate, jnp.stack([xm.real, xm.imag])
        rst, ci = resampler.resample_block(dstate.resamp, xm, plan)
        if stage == "resamp":
            return cstate, dstate, jnp.stack([ci.real, ci.imag])
        dst, demod, magsq = phasediscri.discriminator_delta(
            dstate.discri, ci, cfg.fm_scaling
        )
        if stage == "discri":
            return cstate, dstate, demod + magsq
        mst, avg = movingavg.moving_average(dstate.mavg, magsq)
        if stage == "mavg":
            return cstate, dstate, demod + avg
        sst, gated, is_open = squelch.gate_block(
            dstate.squelch, demod, avg >= 1e-10, cfg.squelch_gate_samples
        )
        if stage == "squelch":
            return cstate, dstate, gated
        bst, audio = firdesign.fir_apply(dstate.bandpass, gated, jnp.asarray(bp_taps))
        return cstate, dstate, audio.astype(jnp.float32)

    return jax.jit(step)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(BLOCK, 2), dtype=np.int16))
    cstate = jax.jit(lambda: pfbmod.make_state(M))()
    dstate = jax.jit(lambda: demod_nfm.make_state(cfg, (NCH,)))()

    all_stages = ["convert", "pfb", "select", "mix", "resamp", "discri",
                  "mavg", "squelch", "full"]
    stages = sys.argv[2].split(",") if len(sys.argv) > 2 else all_stages
    prev = 0.0
    for stage in stages:
        step = upto(stage)
        t0 = time.time()
        outs = step(cstate, dstate, raw)
        jax.block_until_ready(outs[-1])
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            o = None
            for _ in range(8):
                o = step(cstate, dstate, raw)
            jax.block_until_ready(o[-1])
            times.append((time.time() - t0) / 8)
        dt = float(np.median(times)) * 1e6
        print(f"{stage:10s} compile {compile_s:6.1f}s  step {dt:8.1f} us  "
              f"delta {dt - prev:+8.1f} us  in-GS/s {BLOCK / dt / 1e3:8.1f}",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
