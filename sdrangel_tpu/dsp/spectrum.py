"""Spectrum analysis op — the SpectrumVis math, headless.

Reference: sdrgui/dsp/spectrumvis.cpp:77-200 — fixed-size FFT over windowed
sample frames, power re²+im², display value `linear ? v/powFFTDiv :
mult·log2(v)+ofs`, bucket reorder (negative frequencies first), averaging
modes None / Moving / Fixed, positiveOnly duplication. Feeds the REST
spectrum endpoint and the scope/analyzer channels instead of a GL widget.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .fftwindow import Function, window


@dataclasses.dataclass(frozen=True, eq=False)
class SpectrumConfig:
    fft_size: int = 1024
    window: Function = Function.HANNING
    averaging_mode: str = "none"  # none | moving | fixed
    averaging_n: int = 16
    linear: bool = False
    positive_only: bool = False
    overlap: int = 0  # refill size = fft_size - overlap

    @functools.cached_property
    def win(self) -> np.ndarray:
        return window(self.window, self.fft_size)

    @property
    def mult(self) -> float:
        # reference: m_mult = 10/log2(10) scaled for dB from log2 power
        return 10.0 / np.log2(10.0)

    @property
    def pow_fft_div(self) -> float:
        return float(self.fft_size * self.fft_size)


class SpectrumState(NamedTuple):
    avg_sum: jnp.ndarray  # (fft_size,) running average accumulator
    avg_count: jnp.ndarray  # () frames accumulated (fixed mode)


def make_state(cfg: SpectrumConfig) -> SpectrumState:
    return SpectrumState(
        jnp.zeros(cfg.fft_size, dtype=jnp.float32), jnp.zeros((), jnp.int32)
    )


def power_spectrum(
    state: SpectrumState, x: jnp.ndarray, cfg: SpectrumConfig
) -> tuple[SpectrumState, jnp.ndarray]:
    """Compute the display spectrum over a block.

    x: (..., T) complex64, T a multiple of fft_size. Returns (state',
    spectrum (..., fft_size) f32) — the latest frame's display values with
    the selected averaging, buckets reordered negative-first
    (spectrumvis.cpp:137-146). With cfg.overlap set, frames advance by
    fft_size - overlap samples (SpectrumVis's refill semantics) — more
    frames per block, overlapping windows.
    """
    n = cfg.fft_size
    if cfg.overlap:
        if not 0 < cfg.overlap < n:
            raise ValueError(f"overlap must be in (0, fft_size); got {cfg.overlap}")
        hop = n - cfg.overlap
        n_frames = (x.shape[-1] - n) // hop + 1
        idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n)[None, :]
        frames = x[..., idx]
    else:
        frames = x[..., : (x.shape[-1] // n) * n].reshape(*x.shape[:-1], -1, n)
    w = jnp.asarray(cfg.win)
    spec = jnp.fft.fft(frames * w, axis=-1)
    p = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(jnp.float32)

    if cfg.averaging_mode == "moving":
        # EMA over frames within and across blocks
        alpha = 1.0 / cfg.averaging_n

        def fold(acc, fp):
            return (1 - alpha) * acc + alpha * fp

        acc = state.avg_sum
        for i in range(p.shape[-2]):  # few frames per block; unrolled
            acc = fold(acc, p[..., i, :])
        p_disp = acc
        new_state = SpectrumState(acc, state.avg_count)
    elif cfg.averaging_mode == "fixed":
        total = state.avg_sum + p.sum(axis=-2)
        count = state.avg_count + p.shape[-2]
        p_disp = total / jnp.maximum(count, 1).astype(jnp.float32)
        reset = count >= cfg.averaging_n
        new_state = SpectrumState(
            jnp.where(reset, 0.0, total), jnp.where(reset, 0, count)
        )
    else:
        p_disp = p[..., -1, :]
        new_state = state

    if cfg.linear:
        v = p_disp / cfg.pow_fft_div
    else:
        v = cfg.mult * jnp.log2(jnp.maximum(p_disp, 1e-30)) - 20.0 * np.log2(n) * (
            10.0 / np.log2(10.0)
        ) / 10.0  # offset normalizes 0 dBFS full scale
    half = n // 2
    if cfg.positive_only:
        v = jnp.repeat(v[..., :half], 2, axis=-1)
    else:
        v = jnp.concatenate([v[..., half:], v[..., :half]], axis=-1)
    return new_state, v.astype(jnp.float32)


def histogram_decay(
    hist: np.ndarray,
    spectrum_db: np.ndarray,
    lo_db: float = -100.0,
    hi_db: float = 0.0,
    decay: int = 1,
    stroke: int = 30,
) -> np.ndarray:
    """GLSpectrum histogram semantics, headless (sdrgui/gui/glspectrum.h:
    135-174 m_histogram update): hist is (n_bins_power, fft_size) uint8
    intensity; each new spectrum strokes the cell its dB value falls into
    and every cell decays toward zero; below-floor bins don't stroke.
    Host-side NumPy — it runs per display update on display-sized data (the
    session's engine thread calls it once per block)."""
    n_bins = hist.shape[0]
    in_range = spectrum_db >= lo_db
    idx = np.clip(
        ((spectrum_db - lo_db) * (n_bins / (hi_db - lo_db))).astype(np.int32),
        0, n_bins - 1,
    )
    h = hist.astype(np.int32) - decay
    cols = np.arange(len(idx))[in_range]
    h[idx[in_range], cols] += stroke
    return np.clip(h, 0, 255).astype(np.uint8)
