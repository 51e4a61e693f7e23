"""WFM (wideband FM) demodulator.

Reference: plugins/channelrx/demodwfm/wfmdemod.cpp (`feed` :90-180): NCO mix
→ fftfilt RF lowpass at channel rate (rfFilterFftLen 1024) → magsq squelch →
phase discriminator → polyphase resample to audio rate → volume. Unlike NFM
the discriminator runs at the (wide) channel rate, before audio resampling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import fftfilt, movingavg, nco, phasediscri, resampler


@dataclasses.dataclass(frozen=True, eq=False)
class WFMConfig:
    channel_rate: float  # e.g. 192000
    input_offset: float = 0.0
    audio_rate: float = 48000.0
    rf_bandwidth: float = 180000.0
    af_bandwidth: float = 15000.0
    fm_deviation: float = 75000.0
    squelch_db: float = -60.0
    volume: float = 1.0
    audio_mute: bool = False
    fft_len: int = 1024
    block_in: int = 0
    # Test-only parity mode: run the discriminator with the reference's
    # atan2_approximation2 (phasediscri.h:172-197) instead of exact atan2.
    # Exists to DEMONSTRATE the golden residual attribution (VERDICT r4
    # next #3) — never the shipping default.
    ref_atan2_approx: bool = False

    @functools.cached_property
    def rf_filter(self) -> np.ndarray:
        # wfmdemod.cpp:296-298: create_filter(-rfBw/2, +rfBw/2) band form
        fc = 0.5 * self.rf_bandwidth / self.channel_rate
        return fftfilt.create_filter(-fc, fc, self.fft_len)

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.audio_rate)
        # block must also be a multiple of fft hop
        hop = self.fft_len // 2
        while block % hop:
            block *= 2
        return resampler.make_plan(
            self.channel_rate, self.audio_rate, block, cutoff=self.af_bandwidth
        )

    @property
    def fm_scaling(self) -> float:
        return self.channel_rate / (2.0 * self.fm_deviation)


class WFMState(NamedTuple):
    nco: nco.NCOState
    fft: fftfilt.FftFiltState
    mavg: movingavg.MovingAvgState
    discri: phasediscri.DiscriminatorState
    resamp: resampler.ResamplerState


def make_state(cfg: WFMConfig, batch_shape=()) -> WFMState:
    return WFMState(
        nco=nco.make_nco(batch_shape),
        fft=fftfilt.make_state(cfg.fft_len, batch_shape),
        mavg=movingavg.make_state(1024, batch_shape),
        discri=phasediscri.make_state(batch_shape),
        resamp=resampler.init_state(cfg.resampler_plan, batch_shape),
    )


def process(state: WFMState, x: jnp.ndarray, cfg: WFMConfig, offset_hz=None,
            squelch_db=None, volume=None) -> tuple[WFMState, jnp.ndarray]:
    if offset_hz is None:
        inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    else:  # traced live-retune override (applySettings-on-running semantics)
        inc = nco.freq_to_increment_traced(-offset_hz, cfg.channel_rate)
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    fft_state, rf = fftfilt.run_filt(state.fft, xm, jnp.asarray(cfg.rf_filter))

    discri_state, demod, magsq = phasediscri.discriminator_delta(
        state.discri, rf, cfg.fm_scaling, approx=cfg.ref_atan2_approx
    )
    mavg_state, avg = movingavg.moving_average(state.mavg, magsq)
    level = 10.0 ** ((cfg.squelch_db if squelch_db is None else squelch_db) / 10.0)
    demod = jnp.where(avg >= level, demod, 0.0)

    resamp_state, audio_c = resampler.resample_block(
        state.resamp, demod.astype(jnp.complex64), cfg.resampler_plan
    )
    vol = cfg.volume if volume is None else volume
    audio = jnp.real(audio_c) * (0.0 if cfg.audio_mute else vol)

    return (
        WFMState(nco=nco_state, fft=fft_state, mavg=mavg_state,
                 discri=discri_state, resamp=resamp_state),
        audio.astype(jnp.float32),
    )


def meters(state: WFMState, cfg: WFMConfig, dyn: dict) -> dict:
    """Squelch state from the kernel's own moving average (the same window
    the gate uses), against the live threshold when one is threaded."""
    sq = dyn.get("squelch_db", cfg.squelch_db)
    avg = jnp.mean(state.mavg.window, axis=-1)
    return {"squelch": avg >= 10.0 ** (sq / 10.0)}
