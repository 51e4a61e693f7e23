#!/usr/bin/env python3
"""Bisect the product chain's per-block compute (probe_product_path found
~1.1-2 s per 10.24M-sample block where the bench gear does ~30 ms): time
each stage of the 10 MS/s /64 -> NFM session pipeline as its own carried-
state chained jit, with the session's exact shapes.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tools/probe_product_stages.py
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
BB_BLOCK = 160_000          # session's base_block at these rates
DEV_BLOCK = BB_BLOCK << LOG2


def timed(label, make_states, step, *args, iters=8):
    """make_states: () -> state pytree (inside jit); step: (state, *args) ->
    (state, out). Chained-state loop, median per-step ms."""
    try:
        state = jax.jit(make_states)()
        t0 = time.perf_counter()
        state, out = step(state, *args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            state, out = step(state, *args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"  {label:34s} compile {compile_s:6.1f}s  step med "
              f"{med:9.2f} ms  (all: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)
    except Exception as e:
        print(f"  {label:34s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    from sdrangel_tpu.channels import demod_nfm
    from sdrangel_tpu.dsp import channelizer as chanmod
    from sdrangel_tpu.dsp import decimators as dec
    from sdrangel_tpu.dsp import movingavg, nco, phasediscri, resampler
    from sdrangel_tpu.dsp import firdesign, spectrum as dsp_spectrum, squelch

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(-2048, 2048, (DEV_BLOCK, 2), np.int16))

    bb_rate = RATE / (1 << LOG2)
    plan = chanmod.plan_channel(bb_rate, 48000.0, OFFSET)
    print(f"plan: rate={plan.channel_rate} signs={plan.signs} "
          f"resid={plan.residual_offset}", flush=True)
    n_stages = len(plan.signs)
    ch_block = BB_BLOCK >> n_stages
    cfg = demod_nfm.NFMConfig(
        channel_rate=plan.channel_rate, input_offset=plan.residual_offset,
        squelch_db=-100.0, block_in=ch_block)
    rplan = cfg.resampler_plan
    print(f"resampler: p/q={rplan._pq_eff} block {rplan.block_in}->"
          f"{rplan.block_out} L={rplan.residue_kernels.shape}", flush=True)

    # host-side random blocks at each rate (complex as f32 planes; complex
    # built inside the jits to dodge eager-c64)
    bb2 = jnp.asarray(rng.standard_normal((2, BB_BLOCK)).astype(np.float32))
    ch2 = jnp.asarray(rng.standard_normal((2, ch_block)).astype(np.float32))
    au = jnp.asarray(rng.standard_normal(rplan.block_out).astype(np.float32))

    # 1. device cascade /64 on the full 10.24M block
    timed("decimate_flat /64 (10.24M)",
          lambda: dec.init_flat_state(LOG2),
          jax.jit(lambda s, r: dec.decimate_flat_any(
              s, (r[:, 0] + 1j * r[:, 1]).astype(jnp.complex64) * (1 / 32768),
              LOG2, "cen")),
          raw)

    # 2. channelizer HB stages on 160k baseband
    timed(f"channelize {n_stages} stage(s) (160k)",
          lambda: chanmod.init_state(n_stages),
          jax.jit(lambda s, b: chanmod.channelize(
              s, (b[0] + 1j * b[1]).astype(jnp.complex64), plan)),
          bb2)

    # 3. full NFM demod at channel rate
    timed(f"NFM process ({ch_block})",
          lambda: demod_nfm.make_state(cfg),
          jax.jit(lambda s, c: demod_nfm.process(
              s, (c[0] + 1j * c[1]).astype(jnp.complex64), cfg)),
          ch2)

    # 3a. NCO mix alone
    inc = nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate)
    timed("  nco.mix_block",
          lambda: nco.make_nco(),
          jax.jit(lambda s, c: nco.mix_block(
              s, (c[0] + 1j * c[1]).astype(jnp.complex64), jnp.asarray(inc))),
          ch2)

    # 3b. resampler alone
    timed(f"  resampler {rplan._pq_eff}",
          lambda: resampler.init_state(rplan),
          jax.jit(lambda s, c: resampler.resample_block(
              s, (c[0] + 1j * c[1]).astype(jnp.complex64), rplan)),
          ch2)

    # 3c. discriminator + moving avg at audio rate
    timed("  discri+mavg (49152)",
          lambda: (phasediscri.make_state(), movingavg.make_state(1024)),
          jax.jit(lambda s, a: ((lambda d, m: ((d[0], m[0]), (d[1], m[1])))(
              phasediscri.discriminator_delta(
                  s[0], (a + 1j * a).astype(jnp.complex64), cfg.fm_scaling),
              movingavg.moving_average(s[1], a)))),
          au)

    # 3d. squelch gate alone
    timed("  squelch.gate_block (49152)",
          lambda: squelch.make_state(cfg.squelch_gate_samples),
          jax.jit(lambda s, a: (lambda r: (r[0], r[1:]))(squelch.gate_block(
              s, a, a > 0.0, cfg.squelch_gate_samples))),
          au)

    # 3e. audio bandpass FIR (301 taps, FFT fast conv)
    bp = firdesign.kaiser_lowpass(301, 0.1)
    timed("  fir_apply 301 taps (49152)",
          lambda: firdesign.make_state(301),
          jax.jit(lambda s, a: firdesign.fir_apply(s, a, jnp.asarray(bp))),
          au)

    # 4. spectrum tap on 160k baseband
    scfg = dsp_spectrum.SpectrumConfig(fft_size=1024, averaging_mode="moving",
                                       averaging_n=8)
    timed("spectrum tap (160k, fft1024)",
          lambda: dsp_spectrum.make_state(scfg),
          jax.jit(lambda s, b: dsp_spectrum.power_spectrum(
              s, (b[0] + 1j * b[1]).astype(jnp.complex64), scfg)),
          bb2)

    # 5. pow2 control: same cascade on 2^23 (vs #1: isolates non-pow2 cost)
    raw_p2 = jnp.asarray(rng.integers(-2048, 2048, (1 << 23, 2), np.int16))
    timed("decimate_flat /64 (2^23 control)",
          lambda: dec.init_flat_state(LOG2),
          jax.jit(lambda s, r: dec.decimate_flat_any(
              s, (r[:, 0] + 1j * r[:, 1]).astype(jnp.complex64) * (1 / 32768),
              LOG2, "cen")),
          raw_p2)


if __name__ == "__main__":
    main()
