"""Phase-locked loops — the truly sequential recurrences, as lax.scan.

Reference: sdrbase/dsp/phaselockcomplex.{h,cpp} (2nd-order PLL used by
synchronous AM), sdrbase/dsp/phaselock.{h,cpp} (19 kHz pilot PLL with
harmonic outputs for broadcast-FM stereo), freqlockcomplex.cpp.

A PLL's loop filter feedback cannot be parallelized without changing its
dynamics, so these run as `lax.scan` — only ever at audio-class rates where
a serial scan is cheap relative to the decimated stream (SURVEY.md §7.3 #1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PLLState(NamedTuple):
    phase: jnp.ndarray  # (...,) f32 radians
    freq: jnp.ndarray  # (...,) f32 radians/sample


def make_pll(batch_shape=()) -> PLLState:
    return PLLState(
        jnp.zeros(batch_shape, dtype=jnp.float32),
        jnp.zeros(batch_shape, dtype=jnp.float32),
    )


def pll_run(
    state: PLLState,
    x: jnp.ndarray,
    sample_rate: float,
    loop_bw_hz: float = 100.0,
    damping: float = 0.707,
) -> tuple[PLLState, jnp.ndarray]:
    """Track the dominant carrier of x; returns e^{jθ[n]} per sample.

    Standard 2nd-order loop (PhaseLockComplex::computeCoefficients
    semantics): ω_n = 2π·bw/fs, g1 = 2ζω_n, g2 = ω_n².
    x: (..., T) complex64. Scan is over the time axis.
    """
    wn = 2.0 * np.pi * loop_bw_hz / sample_rate
    g1 = jnp.float32(2.0 * damping * wn)
    g2 = jnp.float32(wn * wn)

    xt = jnp.moveaxis(x, -1, 0)  # (T, ...)

    def step(carry, xi):
        phase, freq = carry
        ref = jnp.exp(1j * phase.astype(jnp.complex64))
        err = jnp.angle(xi * jnp.conj(ref)).astype(jnp.float32)
        freq = freq + g2 * err
        phase = phase + freq + g1 * err
        phase = jnp.mod(phase + np.pi, 2.0 * np.pi) - np.pi
        return (phase, freq), ref

    (phase, freq), refs = jax.lax.scan(step, (state.phase, state.freq), xt)
    return PLLState(phase, freq), jnp.moveaxis(refs, 0, -1)


class PilotPLLState(NamedTuple):
    phase: jnp.ndarray
    freq: jnp.ndarray
    lock_avg: jnp.ndarray  # lock detector moving value


def make_pilot_pll(freq_hz: float, sample_rate: float, batch_shape=()) -> PilotPLLState:
    w0 = 2.0 * np.pi * freq_hz / sample_rate
    return PilotPLLState(
        jnp.zeros(batch_shape, dtype=jnp.float32),
        jnp.full(batch_shape, w0, dtype=jnp.float32),
        jnp.zeros(batch_shape, dtype=jnp.float32),
    )


def pilot_pll_run(
    state: PilotPLLState,
    x: jnp.ndarray,
    freq_hz: float,
    sample_rate: float,
    bandwidth_hz: float = 10.0,
) -> tuple[PilotPLLState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """19 kHz pilot tracker for BFM stereo (PhaseLock, phaselock.h:181).

    x: (..., T) float32 (real MPX signal). Returns (state', cos(θ),
    cos(2θ), cos(3θ)) — the harmonically locked references the reference
    produces as pll samples for the 38 kHz stereo and 57 kHz RDS subcarriers.
    """
    w0 = 2.0 * np.pi * freq_hz / sample_rate
    wn = 2.0 * np.pi * bandwidth_hz / sample_rate
    g1 = jnp.float32(2.0 * 0.707 * wn)
    g2 = jnp.float32(wn * wn)
    w_lo = jnp.float32(w0 * 0.9)
    w_hi = jnp.float32(w0 * 1.1)

    xt = jnp.moveaxis(x, -1, 0)

    def step(carry, xi):
        phase, freq, lock = carry
        # phase detector: mix the real input with the quadrature oscillator
        err = (-xi * jnp.sin(phase)).astype(jnp.float32)
        lock = 0.999 * lock + 0.001 * (xi * jnp.cos(phase))
        freq = jnp.clip(freq + g2 * err, w_lo, w_hi)
        phase = phase + freq + g1 * err
        phase = jnp.mod(phase, 2.0 * np.pi)
        return (phase, freq, lock), phase

    (phase, freq, lock), phases = jax.lax.scan(
        step, (state.phase, state.freq, state.lock_avg), xt
    )
    phases = jnp.moveaxis(phases, 0, -1)
    return (
        PilotPLLState(phase, freq, lock),
        jnp.cos(phases),
        jnp.cos(2.0 * phases),
        jnp.cos(3.0 * phases),
    )
