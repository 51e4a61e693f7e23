"""Channel analyzer — SSB-filtered channel with spectrum + scope taps.

Reference: plugins/channelrx/chanalyzer/chanalyzer.{h,cpp} — NCO mix →
decimation ("span") → optional SSB/DSB fftfilt (ssbFftLen 1024) → feeds
ScopeVis/SpectrumVis. The debug/measurement channel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import fftfilt, nco, spectrum
from ..dsp.fftwindow import Function


@dataclasses.dataclass(frozen=True, eq=False)
class ChanAnalyzerConfig:
    channel_rate: float
    input_offset: float = 0.0
    bandwidth: float = 5000.0
    low_cutoff: float = 300.0
    ssb: bool = False
    usb: bool = True
    fft_len: int = 1024  # chanalyzer.h:37 ssbFftLen
    spectrum_size: int = 1024

    @functools.cached_property
    def filter_freq(self) -> np.ndarray:
        if self.ssb:
            return fftfilt.create_filter(
                self.low_cutoff / self.channel_rate,
                self.bandwidth / self.channel_rate,
                self.fft_len,
            )
        return fftfilt.create_dsb_filter(self.bandwidth / self.channel_rate, self.fft_len)

    @functools.cached_property
    def spectrum_cfg(self) -> spectrum.SpectrumConfig:
        return spectrum.SpectrumConfig(
            fft_size=self.spectrum_size, window=Function.HANNING,
            averaging_mode="moving", averaging_n=8,
        )


class ChanAnalyzerState(NamedTuple):
    nco: nco.NCOState
    fft: fftfilt.FftFiltState
    spec: spectrum.SpectrumState


def make_state(cfg: ChanAnalyzerConfig, batch_shape=()) -> ChanAnalyzerState:
    return ChanAnalyzerState(
        nco=nco.make_nco(batch_shape),
        fft=fftfilt.make_state(cfg.fft_len, batch_shape),
        spec=spectrum.make_state(cfg.spectrum_cfg),
    )


class ChanAnalyzerOutputs(NamedTuple):
    iq: jnp.ndarray  # filtered channel samples (the scope feed)
    spectrum: jnp.ndarray  # display spectrum
    channel_power_db: jnp.ndarray


def process(
    state: ChanAnalyzerState, x: jnp.ndarray, cfg: ChanAnalyzerConfig
) -> tuple[ChanAnalyzerState, ChanAnalyzerOutputs]:
    inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    if cfg.ssb:
        fft_state, y = fftfilt.run_ssb(state.fft, xm, cfg.filter_freq, usb=cfg.usb)
    else:
        fft_state, y = fftfilt.run_filt(state.fft, xm, jnp.asarray(cfg.filter_freq))
    spec_state, sp = spectrum.power_spectrum(state.spec, y, cfg.spectrum_cfg)
    power = jnp.mean(jnp.real(y) ** 2 + jnp.imag(y) ** 2, axis=-1)
    power_db = 10.0 * jnp.log10(jnp.maximum(power, 1e-30))
    return (
        ChanAnalyzerState(nco_state, fft_state, spec_state),
        ChanAnalyzerOutputs(y, sp, power_db.astype(jnp.float32)),
    )
