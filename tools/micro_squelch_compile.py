#!/usr/bin/env python3
"""Bisect the chain64 squelch-rung compile blowup on TPU.

tools/chain64_ladder256.py: the rung that adds squelch.gate_block jumps
5s -> 66s of compile at 2^22, yet tools/micro_scan.py shows the
saturating-counter associative scan ALONE compiles in ~1-3s at the same
shape. Variants isolate the scan-x-context fusion interaction:

  base     — the real squelch rung (expect ~66 s)
  barrier  — optimization_barrier on (audio, open_cond) ahead of gate_block
  major    — scan along a major axis instead of the minor (lane) axis
  both     — barrier + major

  PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_squelch_compile.py [log2block] [variants]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sdrangel_tpu.dsp import pfb as pfbmod
from sdrangel_tpu.channels import demod_nfm
from sdrangel_tpu.dsp import movingavg, nco, phasediscri, resampler, squelch
from sdrangel_tpu.dsp.scanops import saturating_counter

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
GATE = cfg.squelch_gate_samples


def sat_major(deltas, lo, hi, init):
    a = jnp.moveaxis(deltas.astype(jnp.float32), -1, 0)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))

    def compose(f, g):
        af, lf, hf = f
        ag, lg, hg = g
        return af + ag, jnp.clip(lf + ag, lg, hg), jnp.clip(hf + ag, lg, hg)

    aa, ll, hh = jax.lax.associative_scan(compose, (a, l, h), axis=0)
    return jnp.moveaxis(jnp.clip(init[None] + aa, ll, hh), 0, -1)


def make_step(variant):
    def step(cstate, dstate, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        cstate, yall = pfbmod.analyze(cstate, x, M)
        y = jnp.concatenate([yall[..., M - 32:], yall[..., :32]], axis=-1)
        y = jnp.moveaxis(y, -1, 0)
        inc = nco.freq_to_increment_traced(-jnp.asarray(residual), cfg.channel_rate)
        nst, xm = nco.mix_block(dstate.nco, y, inc)
        rst, ci = resampler.resample_block(dstate.resamp, xm, plan)
        dst, demod, magsq = phasediscri.discriminator_delta(
            dstate.discri, ci, cfg.fm_scaling
        )
        mst, avg = movingavg.moving_average(dstate.mavg, magsq)
        open_cond = avg >= 1e-10
        audio = demod
        if variant in ("barrier", "both"):
            audio, open_cond = jax.lax.optimization_barrier((audio, open_cond))
        if variant == "2level":
            sys.path.insert(0, "/root/repo/tools")
            from micro_scan import sat_2level
            deltas = jnp.where(open_cond, 1.0, -1.0)
            counts = sat_2level(deltas, 0.0, 2.0 * GATE, dstate.squelch.count, k=512)
            is_open = counts > GATE
            written = jnp.where(open_cond, audio, 0.0)
            ext = jnp.concatenate([dstate.squelch.delay, written], axis=-1)
            gated = jnp.where(is_open, ext[..., : audio.shape[-1]], 0.0)
        elif variant == "scan_nodelay":
            deltas = jnp.where(open_cond, 1.0, -1.0)
            counts = saturating_counter(deltas, 0.0, 2.0 * GATE, dstate.squelch.count)
            is_open = counts > GATE
            gated = jnp.where(is_open & open_cond, audio, 0.0)
        elif variant == "noscan_delay":
            counts = jnp.clip(jnp.cumsum(jnp.where(open_cond, 1.0, -1.0), axis=-1)
                              + dstate.squelch.count[..., None], 0.0, 2.0 * GATE)
            is_open = counts > GATE
            written = jnp.where(open_cond, audio, 0.0)
            ext = jnp.concatenate([dstate.squelch.delay, written], axis=-1)
            gated = jnp.where(is_open, ext[..., : audio.shape[-1]], 0.0)
        elif variant == "neither":
            gated = jnp.where(open_cond, audio, 0.0)
        elif variant in ("major", "both"):
            deltas = jnp.where(open_cond, 1.0, -1.0)
            counts = sat_major(deltas, 0.0, 2.0 * GATE, dstate.squelch.count)
            is_open = counts > GATE
            written = jnp.where(open_cond, audio, 0.0)
            ext = jnp.concatenate([dstate.squelch.delay, written], axis=-1)
            gated = jnp.where(is_open, ext[..., : audio.shape[-1]], 0.0)
        else:
            sst, gated, is_open = squelch.gate_block(
                dstate.squelch, audio, open_cond, GATE
            )
        return cstate, dstate, gated

    return jax.jit(step)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(BLOCK, 2), dtype=np.int16))
    cstate = jax.jit(lambda: pfbmod.make_state(M))()
    dstate = jax.jit(lambda: demod_nfm.make_state(cfg, (NCH,)))()
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "barrier", "major", "both", "base"]
    for variant in variants:
        step = make_step(variant)
        t0 = time.time()
        o = step(cstate, dstate, raw)
        jax.block_until_ready(o[-1])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(8):
                o = step(cstate, dstate, raw)
            jax.block_until_ready(o[-1])
            times.append((time.time() - t0) / 8)
        print(f"{variant:8s} compile {compile_s:6.1f}s  "
              f"step {np.median(times)*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
