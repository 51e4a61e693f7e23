"""UDPSrc — an Rx channel that forwards channelized I/Q or demodulated
output over UDP.

Reference: plugins/channelrx/udpsrc/udpsrc.{h,cpp} — NCO mix → resample to
the requested output rate → optional AGC → per-format branch (S16LE I/Q
16/24-bit, mono audio, LSB/USB via fftfilt, NFM discriminator, AM
magnitude, udpsrc.h:200-313, udpsrc.cpp feed) → UDPSink datagrams.

Here the device side computes the formatted stream each block; the session
(runtime/session.py) encodes it with io.udp.encode_payload and sends it
through io.udp.UdpSink, reconciling the socket with the channel's
udpAddress/udpPort/udpFormat settings between blocks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import agc, fftfilt, movingavg, nco, phasediscri, resampler

#: device-side output formats (io.udp wire formats iq16/iq24 carry the
#: complex stream; mono16/float32 carry the scalar branch)
FORMATS = ("iq", "mono", "lsb", "usb", "nfm", "am")


@dataclasses.dataclass(frozen=True, eq=False)
class UdpSrcConfig:
    channel_rate: float
    input_offset: float = 0.0
    output_sample_rate: float = 48_000.0  # udpsrc.h m_outputSampleRate
    rf_bandwidth: float = 12_500.0
    fmt: str = "iq"  # FORMATS
    gain: float = 1.0
    squelch_db: float = -60.0
    squelch_enabled: bool = True
    agc_enable: bool = False  # MagAGC before the format branch (udpsrc.cpp)
    fm_deviation: float = 2500.0
    fft_len: int = 1024
    audio_active: bool = False  # reserved: reverse audio path (udpsink role)
    block_in: int = 0

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.output_sample_rate)
        return resampler.make_plan(
            self.channel_rate, self.output_sample_rate, block,
            cutoff=self.rf_bandwidth / 2.0,
        )

    @functools.cached_property
    def ssb_filter(self) -> np.ndarray:
        f_hi = (self.rf_bandwidth / 2.0) / self.output_sample_rate
        return fftfilt.create_filter(0.0, f_hi, self.fft_len)

    @functools.cached_property
    def agc_config(self) -> agc.MagAGCConfig:
        return agc.MagAGCConfig(order_r=1.0, threshold_enable=False)


class UdpSrcState(NamedTuple):
    nco: nco.NCOState
    resamp: resampler.ResamplerState
    mavg: movingavg.MovingAvgState
    fft: fftfilt.FftFiltState
    discri: phasediscri.DiscriminatorState
    agc: agc.MagAGCState


class UdpSrcOutputs(NamedTuple):
    iq: jnp.ndarray  # (..., T_out) complex64 — resampled channel stream
    scalar: jnp.ndarray  # (..., T_out) f32 — demod branch (mono/nfm/am/ssb re)
    power: jnp.ndarray  # (...,) mean magsq
    squelch_open: jnp.ndarray  # (...,) bool


def make_state(cfg: UdpSrcConfig, batch_shape=()) -> UdpSrcState:
    return UdpSrcState(
        nco=nco.make_nco(batch_shape),
        resamp=resampler.init_state(cfg.resampler_plan, batch_shape),
        mavg=movingavg.make_state(480, batch_shape),
        fft=fftfilt.make_state(cfg.fft_len, batch_shape),
        discri=phasediscri.make_state(batch_shape),
        agc=agc.make_state(cfg.agc_config, batch_shape),
    )


def process(
    state: UdpSrcState, x: jnp.ndarray, cfg: UdpSrcConfig, offset_hz=None,
    squelch_db=None,
) -> tuple[UdpSrcState, UdpSrcOutputs]:
    if cfg.fmt not in FORMATS:
        raise ValueError(f"udpsrc fmt {cfg.fmt!r}; choose from {FORMATS}")
    if offset_hz is None:
        inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    else:
        inc = nco.freq_to_increment_traced(-offset_hz, cfg.channel_rate)
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, ci = resampler.resample_block(state.resamp, xm, cfg.resampler_plan)

    magsq = (jnp.real(ci) ** 2 + jnp.imag(ci) ** 2).astype(jnp.float32)
    mavg_state, avg = movingavg.moving_average(state.mavg, magsq)
    level = 10.0 ** ((cfg.squelch_db if squelch_db is None else squelch_db) / 10.0)
    gate = avg >= level if cfg.squelch_enabled else jnp.ones_like(avg, bool)

    agc_state, fft_state, discri_state = state.agc, state.fft, state.discri
    if cfg.agc_enable:
        agc_state, ci, _, _ = agc.mag_agc(state.agc, ci, cfg.agc_config)
    ci = jnp.where(gate, ci, 0.0) * cfg.gain

    if cfg.fmt in ("lsb", "usb"):
        fft_state, filt = fftfilt.run_ssb(
            state.fft, ci, jnp.asarray(cfg.ssb_filter), usb=cfg.fmt == "usb"
        )
        scalar = jnp.real(filt) + jnp.imag(filt)  # udpsrc.cpp USB/LSB sum
        iq_out = filt
    elif cfg.fmt == "nfm":
        # fs/(2*dev): discriminator_delta works in units of pi, so full
        # deviation maps to ±1.0 — the same convention as demod_nfm (the
        # reference's 2*pi constant belongs to its atan2-based discri)
        discri_state, demod, _ = phasediscri.discriminator_delta(
            state.discri, ci, cfg.output_sample_rate / (2.0 * cfg.fm_deviation)
        )
        scalar = jnp.where(gate, demod, 0.0)
        iq_out = ci
    elif cfg.fmt == "am":
        scalar = jnp.sqrt(magsq) * cfg.gain
        scalar = jnp.where(gate, scalar - jnp.mean(scalar, axis=-1, keepdims=True), 0.0)
        iq_out = ci
    else:  # iq / mono
        scalar = jnp.real(ci)
        iq_out = ci

    outs = UdpSrcOutputs(
        iq=iq_out.astype(jnp.complex64),
        scalar=scalar.astype(jnp.float32),
        power=jnp.mean(magsq, axis=-1),
        squelch_open=jnp.any(gate, axis=-1),
    )
    return (
        UdpSrcState(nco=nco_state, resamp=resamp_state, mavg=mavg_state,
                    fft=fft_state, discri=discri_state, agc=agc_state),
        outs,
    )
