"""LoRa chirp demodulator.

Reference: plugins/channelrx/demodlora/lorademod.cpp (`feed`): NCO mix →
resample to the LoRa bandwidth → multiply by the conjugate base chirp
(`m_angle += m_chirp` accumulation mod SPREADFACTOR) → sliding FFT argmax
(`detect()`), symbol = peak bin. Here the de-chirp + FFT runs batched over
whole symbol frames (one FFT per symbol, all symbols of a block at once).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import nco, resampler


@dataclasses.dataclass(frozen=True, eq=False)
class LoRaConfig:
    channel_rate: float
    input_offset: float = 0.0
    bandwidth: float = 125000.0  # chip rate
    spread_factor: int = 7  # symbol = 2^SF chips
    block_in: int = 0  # input samples per block (0 -> auto; must be a
    # multiple of block_factor() when driven by the engine)

    @property
    def n_bins(self) -> int:
        return 1 << self.spread_factor

    def block_factor(self) -> int:
        """Engine blocks must be multiples of this: p·2^SF input samples
        yield q·2^SF chips — whole dechirp frames per block."""
        from fractions import Fraction

        p = Fraction(self.channel_rate / self.bandwidth).limit_denominator(1 << 16).numerator
        return p * self.n_bins

    @functools.cached_property
    def resamp_plan(self) -> resampler.ResamplerPlan:
        block = self.block_in
        if not block:
            block = self.block_factor()
            while block < 4096:
                block *= 2
        return resampler.make_plan(self.channel_rate, self.bandwidth, block)

    @functools.cached_property
    def base_downchirp(self) -> np.ndarray:
        """conj of the base upchirp over one symbol (2^SF chips)."""
        n = self.n_bins
        k = np.arange(n, dtype=np.float64)
        phase = 2.0 * np.pi * (k * k / (2.0 * n) - k / 2.0)
        return np.exp(-1j * phase).astype(np.complex64)


class LoRaState(NamedTuple):
    nco: nco.NCOState
    resamp: resampler.ResamplerState


def make_state(cfg: LoRaConfig, batch_shape=()) -> LoRaState:
    return LoRaState(
        nco=nco.make_nco(batch_shape),
        resamp=resampler.init_state(cfg.resamp_plan, batch_shape),
    )


class LoRaOutputs(NamedTuple):
    symbols: jnp.ndarray  # (..., F) int32 argmax bin per symbol frame
    magnitudes: jnp.ndarray  # (..., F) float32 peak magnitude
    snr_est: jnp.ndarray  # (..., F) peak / mean ratio


def process(state: LoRaState, x: jnp.ndarray, cfg: LoRaConfig) -> tuple[LoRaState, LoRaOutputs]:
    """Chip-aligned demod. The registry's block_factor sizes blocks so
    chips/block is an exact multiple of 2^SF — frames stay aligned across
    blocks with no partial-symbol carry (a non-multiple block_in would
    silently drop the remainder chips and desynchronize framing)."""
    inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, chips = resampler.resample_block(state.resamp, xm, cfg.resamp_plan)

    n = cfg.n_bins
    if chips.shape[-1] % n:
        raise ValueError(
            f"block yields {chips.shape[-1]} chips — not a multiple of "
            f"2^SF={n}; dropped remainder chips would desynchronize "
            f"symbol framing (size block_in via the registry block_factor)")
    f = chips.shape[-1] // n
    frames = chips[..., : f * n].reshape(*chips.shape[:-1], f, n)
    dechirped = frames * jnp.asarray(cfg.base_downchirp)
    spec = jnp.abs(jnp.fft.fft(dechirped, axis=-1))
    symbols = jnp.argmax(spec, axis=-1).astype(jnp.int32)
    mags = jnp.max(spec, axis=-1)
    snr = mags / jnp.maximum(jnp.mean(spec, axis=-1), 1e-12)

    new_state = LoRaState(nco_state, resamp_state)
    return new_state, LoRaOutputs(symbols, mags.astype(jnp.float32), snr.astype(jnp.float32))


def make_symbol_chirps(symbols: np.ndarray, cfg: LoRaConfig) -> np.ndarray:
    """Golden generator: LoRa upchirps for the given symbol values at the
    chip rate (used by tests to close the loop)."""
    n = cfg.n_bins
    k = np.arange(n, dtype=np.float64)
    out = []
    for s in symbols:
        kk = (k + float(s)) % n
        phase = 2.0 * np.pi * (kk * kk / (2.0 * n) - kk / 2.0)
        out.append(np.exp(1j * phase))
    return np.concatenate(out).astype(np.complex64)
