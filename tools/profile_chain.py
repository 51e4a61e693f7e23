"""Per-stage timing of the headline bench chain on the real chip.

Each stage is jitted separately (with device outputs fetched as f32 stacks)
and timed with the median-of-passes policy; stages compose cumulatively so
the deltas attribute time. Not a correctness tool — bench.py stays the
honest number.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from sdrangel_tpu.channels import demod_nfm
from sdrangel_tpu.dsp import channelizer as chanmod
from sdrangel_tpu.dsp import decimators as dec


def timeit(fn, args, iters=20, passes=5):
    out = fn(*args)
    jax.block_until_ready(out)
    rates = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.perf_counter() - t0) / iters)
    return float(np.median(rates))


def main():
    n_channels = 16
    log2 = 6
    block = 1 << int(os.environ.get("SDRANGEL_BENCH_LOG2BLOCK", "23"))
    device_rate = 12_288_000.0
    baseband_rate = device_rate / (1 << log2)
    req_band = baseband_rate / 6.0
    leaf = baseband_rate / 8.0
    offsets = np.array([
        c + j
        for c in (-3 * leaf, -leaf, leaf, 3 * leaf)
        for j in (-0.18 * leaf, -0.06 * leaf, 0.06 * leaf, 0.18 * leaf)
    ])
    plans = [chanmod.plan_channel(baseband_rate, req_band, o) for o in offsets]
    n_stages = len(plans[0].signs)
    signs = np.array([p.signs for p in plans])
    residual = jnp.asarray([p.residual_offset for p in plans], jnp.float32)
    chan_rate = plans[0].channel_rate
    demod_cfg = demod_nfm.NFMConfig(
        channel_rate=chan_rate,
        block_in=(block >> log2) >> n_stages,
        squelch_db=-100.0,
        squelch_gate_ms=1.0,
    )

    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(block, 2), dtype=np.int16))
    casc = jax.jit(lambda: dec.init_flat_state(log2))()
    cstate = jax.jit(
        lambda: chanmod.init_state(n_stages, batch_shape=(chanmod.unique_paths(signs),))
    )()
    dstate = jax.jit(lambda: demod_nfm.make_state(demod_cfg, batch_shape=(n_channels,)))()

    @jax.jit
    def s_decim(casc, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
        return casc, jnp.stack([jnp.real(bb), jnp.imag(bb)])

    @jax.jit
    def s_chan(casc, cstate, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
        cstate, y = chanmod.channelize_bank_unique(cstate, bb, signs)
        return casc, cstate, jnp.stack([jnp.real(y), jnp.imag(y)])

    @jax.jit
    def s_full(casc, cstate, dstate, raw):
        x = raw.astype(jnp.float32) * (1.0 / 32768.0)
        x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
        cstate, y = chanmod.channelize_bank_unique(cstate, bb, signs)
        dstate, audio = demod_nfm.process(dstate, y, demod_cfg, offset_hz=residual)
        return casc, cstate, dstate, audio

    # NFM sub-stages at the channel rate, 16-channel batch
    chan_block = demod_cfg.block_in
    ci16 = jnp.asarray(
        (rng.normal(size=(n_channels, chan_block, 2)) * 0.1).astype(np.float32)
    )

    from sdrangel_tpu.dsp import (firdesign, movingavg, nco, phasediscri,
                                  resampler, squelch)

    plan = demod_cfg.resampler_plan

    def sub(fn):
        return jax.jit(fn)

    s_nco = sub(lambda st, v: nco.mix_block(
        st.nco, (v[..., 0] + 1j * v[..., 1]).astype(jnp.complex64),
        nco.freq_to_increment_traced(-residual[:, None], demod_cfg.channel_rate))[1]
        and 0)

    t_decim = timeit(s_decim, (casc, raw))
    t_chan = timeit(s_chan, (casc, cstate, raw))
    t_full = timeit(s_full, (casc, cstate, dstate, raw))
    print(f"block={block} ({block/1e6:.1f} MS)")
    print(f"decimate          : {t_decim*1e3:8.3f} ms  ({block/t_decim/1e9:7.2f} GS/s)")
    print(f"+channelize       : {t_chan*1e3:8.3f} ms  (delta {(t_chan-t_decim)*1e3:.3f} ms)")
    print(f"+nfm (full)       : {t_full*1e3:8.3f} ms  (delta {(t_full-t_chan)*1e3:.3f} ms)")
    print(f"chain rate        : {block/t_full/1e9:7.2f} GS/s")

    # --- NFM sub-stage attribution (cumulative jits at channel rate) -----
    inc = nco.freq_to_increment(-1000.0, demod_cfg.channel_rate)

    def mk(upto):
        @jax.jit
        def f(dstate, v):
            x = (v[..., 0] + 1j * v[..., 1]).astype(jnp.complex64)
            ns, xm = nco.mix_block(dstate.nco, x, jnp.asarray(inc))
            if upto == "nco":
                return jnp.stack([jnp.real(xm), jnp.imag(xm)])
            rs, ci = resampler.resample_block(dstate.resamp, xm, plan)
            if upto == "resamp":
                return jnp.stack([jnp.real(ci), jnp.imag(ci)])
            ds, demod, magsq = phasediscri.discriminator_delta(
                dstate.discri, ci, demod_cfg.fm_scaling)
            if upto == "discri":
                return demod
            ms, avg = movingavg.moving_average(dstate.mavg, magsq)
            open_cond = avg >= 1e-10
            ss, gated, is_open = squelch.gate_block(
                dstate.squelch, demod, open_cond, demod_cfg.squelch_gate_samples)
            if upto == "squelch":
                return gated
            bs, audio = firdesign.fir_apply(
                dstate.bandpass, gated, jnp.asarray(demod_cfg.bandpass_taps))
            return audio
        return f

    prev = 0.0
    for stage in ["nco", "resamp", "discri", "squelch", "audio"]:
        t = timeit(mk(stage), (dstate, ci16))
        print(f"nfm..{stage:8s}: {t*1e3:8.3f} ms (delta {(t-prev)*1e3:.3f})")
        prev = t


if __name__ == "__main__":
    main()
