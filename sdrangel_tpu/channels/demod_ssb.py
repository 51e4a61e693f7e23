"""SSB/DSB demodulator.

Reference: plugins/channelrx/demodssb/ssbdemod.cpp (`feed` :147-280): NCO mix
→ resample to audio rate → fftfilt::runSSB (1024-point, band edges from
lowCutoff/bandwidth, USB/LSB by sign) or runDSB → MagAGC with squelch delay
line → audio: mono (re+im), binaural options.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import agc, fftfilt, nco, resampler


@dataclasses.dataclass(frozen=True, eq=False)
class SSBConfig:
    channel_rate: float
    input_offset: float = 0.0
    audio_rate: float = 48000.0
    bandwidth: float = 3000.0  # signed in the reference; sign picks the sideband
    low_cutoff: float = 300.0
    usb: bool = True
    dsb: bool = False
    volume: float = 1.0
    agc_enable: bool = True
    agc_power_threshold_db: float = -40.0
    agc_threshold_gate: int = 4  # milliseconds (ssbdemod.cpp:505)
    agc_time_log2: int = 7  # nbSamples = (rate/1000) << this
    audio_binaural: bool = False
    audio_flip_channels: bool = False
    audio_mute: bool = False
    fft_len: int = 1024  # ssbdemod.h ssbFftLen
    block_in: int = 0

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.audio_rate)
        # ssbdemod.cpp:381: create(16, inputRate, bandwidth*1.5, 2.0) — the
        # reference pre-filters at 1.5x the SSB bandwidth with short legs
        return resampler.make_plan(
            self.channel_rate, self.audio_rate, block,
            cutoff=abs(self.bandwidth) * 1.5, nb_taps_per_phase=2.0,
        )

    @functools.cached_property
    def filter_freq(self) -> np.ndarray:
        f_lo = self.low_cutoff / self.audio_rate
        f_hi = abs(self.bandwidth) / self.audio_rate
        if self.dsb:
            return fftfilt.create_dsb_filter(f_hi, self.fft_len)
        return fftfilt.create_filter(f_lo, f_hi, self.fft_len)

    @functools.cached_property
    def agc_config(self) -> agc.MagAGCConfig:
        # reference mapping (ssbdemod.cpp:497-533): nbSamples =
        # (audioRate/1000) << agcTimeLog2; resize(nb, nb/2, agcTarget);
        # stepDownDelay = nb; gate in MILLISECONDS; agcTarget 3276.8 of
        # 32768 full scale = 0.1 in this framework's unit-float convention
        nb = int(self.audio_rate / 1000) << self.agc_time_log2
        return agc.MagAGCConfig(
            order_r=0.1,
            history_size=nb,
            threshold=10.0 ** (self.agc_power_threshold_db / 10.0),
            threshold_enable=self.agc_enable,
            gate=int(self.audio_rate / 1000) * self.agc_threshold_gate,
            step_length=nb // 2,
            step_down_delay=nb,
            clamping=False,
        )


class SSBState(NamedTuple):
    nco: nco.NCOState
    resamp: resampler.ResamplerState
    fft: fftfilt.FftFiltState
    agc: agc.MagAGCState
    #: the reference's squelch delay line (ssbdemod.cpp:222-225): leveled
    #: samples are written, audio reads them stepDownDelay samples LATER
    #: multiplied by the CURRENT step value — the release gate cuts the
    #: tail without eating the attack
    delay: jnp.ndarray
    #: one-sample channel-stream aligner (r5): our resampler emits the
    #: reference's steady schedule WITHOUT its initial bonus output
    #: (resampler.make_plan), so our channel stream leads the reference's
    #: by exactly one sample — and the OLA sideband filter is
    #: framing-SENSITIVE (its brickwall impulse response exceeds the
    #: hop), so that shift is not absorbable downstream: it capped the
    #: ssb96 golden at 60.0 dB (118+ dB per stage). Delaying the filter
    #: feed by one sample restores the reference's framing exactly.
    align: jnp.ndarray


def make_state(cfg: SSBConfig, batch_shape=()) -> SSBState:
    return SSBState(
        nco=nco.make_nco(batch_shape),
        resamp=resampler.init_state(cfg.resampler_plan, batch_shape),
        fft=fftfilt.make_state(cfg.fft_len, batch_shape),
        agc=agc.make_state(cfg.agc_config, batch_shape),
        delay=jnp.zeros(
            (*batch_shape, cfg.agc_config.step_down_delay), jnp.complex64),
        align=jnp.zeros((*batch_shape, 1), jnp.complex64),
    )


def process(state: SSBState, x: jnp.ndarray, cfg: SSBConfig, offset_hz=None,
            volume=None) -> tuple[SSBState, jnp.ndarray]:
    """Returns (state', audio). Mono: (..., T); binaural: (..., T, 2)."""
    plan = cfg.resampler_plan
    if offset_hz is None:
        inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    else:  # traced live-retune override (applySettings-on-running semantics)
        inc = nco.freq_to_increment_traced(-offset_hz, cfg.channel_rate)
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, ci = resampler.resample_block(state.resamp, xm, plan)
    # one-sample aligner: see SSBState.align
    ext_a = jnp.concatenate([state.align, ci], axis=-1)
    ci = ext_a[..., :-1]
    align_state = ext_a[..., -1:]

    if cfg.dsb:
        fft_state, filt = fftfilt.run_dsb(state.fft, ci, jnp.asarray(cfg.filter_freq))
    else:
        fft_state, filt = fftfilt.run_ssb(
            state.fft, ci, cfg.filter_freq, usb=cfg.usb
        )

    if cfg.agc_enable:
        agc_state, leveled, _, ramp = agc.mag_agc(
            state.agc, filt, cfg.agc_config)
        # delay-line + read-side step gating (ssbdemod.cpp:222-225): the
        # written sample carries u0*ramp(write); the read multiplies by
        # ramp(now) again — a squelch release that cuts the tail
        t = filt.shape[-1]
        ext = jnp.concatenate([state.delay, leveled], axis=-1)
        delayed = ext[..., :t]
        new_delay = ext[..., t:]
        leveled = delayed * ramp.astype(jnp.complex64)
    else:
        # AGC off: pass through un-gained. (In the reference AT THIS
        # VERSION the agc-off path is effectively MUTED — the read-side
        # step value stays frozen at 0 because the AGC is never fed,
        # ssbdemod.cpp:216-225 with agc.cpp:196-207; pinned as an upstream
        # quirk by the ssb96 golden. Later reference versions fixed it;
        # this framework keeps the sane passthrough.)
        agc_state, leveled, new_delay = state.agc, filt, state.delay

    # ssbdemod.cpp:493-494: m_volume = settings.m_volume / 4.0 ("for
    # 3276.8") — the /4 is part of the reference's volume semantics
    vol = 0.0 if cfg.audio_mute else (cfg.volume if volume is None else volume) / 4.0
    if cfg.audio_binaural:
        l = jnp.real(leveled)
        r = jnp.imag(leveled)
        if cfg.audio_flip_channels:
            l, r = r, l
        audio = jnp.stack([l, r], axis=-1) * vol
    else:
        # mono sums I+Q at 0.7 (ssbdemod.cpp:245)
        audio = (jnp.real(leveled) + jnp.imag(leveled)) * 0.7 * vol

    return (
        SSBState(nco=nco_state, resamp=resamp_state, fft=fft_state,
                 agc=agc_state, delay=new_delay, align=align_state),
        audio.astype(jnp.float32),
    )
