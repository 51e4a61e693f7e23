"""AM demodulator.

Reference: plugins/channelrx/demodam/amdemod.cpp — `processOneSample`
(:152-260): NCO mix → resample to audio rate → squelch on 1s-average magsq →
plain envelope sqrt(magsq) with DC removal via a 308-tap-equivalent highpass
(reference uses a bandpass 300..4000), volume; optional PLL-synchronous AM
(PhaseLockComplex + SSB/DSB fftfilt + MagAGC) — provided via `sync_am`.
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

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.audio_rate)
        return resampler.make_plan(
            self.channel_rate, self.audio_rate, block, cutoff=self.rf_bandwidth / 2.2  # amdemod.cpp:370
        )

    @functools.cached_property
    def bandpass_taps(self) -> np.ndarray:
        # amdemod.cpp:373: create(301, rate, 300, rfBandwidth/2)
        return firdesign.bandpass(
            301, 300.0 / self.audio_rate,
            (self.rf_bandwidth / 2.0) / self.audio_rate)

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
        inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    else:  # traced live-retune override (applySettings-on-running semantics)
        inc = nco.freq_to_increment_traced(-offset_hz, cfg.channel_rate)
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, ci = resampler.resample_block(state.resamp, xm, plan)

    magsq = (jnp.real(ci) ** 2 + jnp.imag(ci) ** 2).astype(jnp.float32)
    mavg_state, avg = movingavg.moving_average(state.mavg, magsq)
    level = 10.0 ** ((cfg.squelch_db if squelch_db is None else squelch_db) / 10.0)
    open_cond = avg >= level

    pll_state, fft_state, agc_state = state.pll, state.fft, state.agc
    if cfg.sync_am:
        # the reference sync mix (amdemod.cpp:195-197): yr+j*yi equals
        # j * ci * conj(pll_phasor) — note the extra 90° rotation; the
        # (re+im) audio projection below depends on it
        pll_state, carrier = phaselock.pll_run(state.pll, ci, cfg.audio_rate)
        mixed = (1j * ci * jnp.conj(carrier)).astype(jnp.complex64)
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
        env = jnp.sqrt(magsq)
        # the reference normalizes by the trailing-window envelope mean
        # (it feeds the delayed envelope only while the squelch is open;
        # here the feed is unconditional — identical once the gate settles)
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
        pll=pll_state, fft=fft_state, agc=agc_state, vol_agc=vol_state,
    )
    return new_state, audio.astype(jnp.float32)


def meters(state: AMState, cfg: AMConfig, dyn: dict) -> dict:
    return {"squelch": state.squelch.count > _SQUELCH_GATE}
