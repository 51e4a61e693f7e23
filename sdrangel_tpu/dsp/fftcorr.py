"""FFT cross/auto-correlation.

Reference: sdrbase/dsp/fftcorr.{h,cpp} — overlap-processed correlation of two
complex streams via forward FFT, conjugate multiply, inverse FFT (used by
the channel analyzer family). Block form: both inputs frame into fft-size
chunks; correlation per frame is ifft(fft(a)·conj(fft(b)))."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FftCorrState(NamedTuple):
    tail_a: jnp.ndarray
    tail_b: jnp.ndarray


def make_state(fft_size: int = 1024, batch_shape=()) -> FftCorrState:
    z = jnp.zeros((*batch_shape, fft_size // 2), jnp.complex64)
    return FftCorrState(z, z)


def correlate_block(
    state: FftCorrState, a: jnp.ndarray, b: jnp.ndarray, fft_size: int = 1024
) -> tuple[FftCorrState, jnp.ndarray]:
    """Windowless overlap correlation: frames of fft_size/2 new samples with
    the previous half prepended (50% overlap). Returns (state', corr) with
    corr: (..., F, fft_size) complex lag spectra per frame (lag 0 centred at
    index 0, negative lags wrapped — the raw ifft convention)."""
    hop = fft_size // 2
    t = a.shape[-1]
    assert t % hop == 0

    def frames(x, tail):
        ext = jnp.concatenate([tail, x], axis=-1)
        n = t // hop
        idx = jnp.arange(n)[:, None] * hop + jnp.arange(fft_size)[None, :]
        return ext[..., idx], ext[..., t:]

    fa, tail_a = frames(a, state.tail_a)
    fb, tail_b = frames(b, state.tail_b)
    corr = jnp.fft.ifft(
        jnp.fft.fft(fa, axis=-1) * jnp.conj(jnp.fft.fft(fb, axis=-1)), axis=-1
    )
    return FftCorrState(tail_a, tail_b), corr.astype(jnp.complex64)


def autocorrelate_block(
    state: FftCorrState, x: jnp.ndarray, fft_size: int = 1024
) -> tuple[FftCorrState, jnp.ndarray]:
    return correlate_block(state, x, x, fft_size)
