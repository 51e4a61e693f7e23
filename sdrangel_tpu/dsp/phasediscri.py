"""FM phase discriminators — block-vectorized.

Reference: sdrbase/dsp/phasediscri.h — `phaseDiscriminatorDelta` (:61-78)
computes atan2 phase per sample, differentiates with ±2π wrap (deviation in
units of sample rate maps to ±1), scaled by fmScaling; `phaseDiscriminator`
(:50-54) is the conjugate-product atan2; `phaseDiscriminator2` (:84-97) is the
multiply-only approximation.

The per-sample recurrences are pure prefix operations on the block: arg
differences need only the previous block's last sample — a one-element carry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiscriminatorState(NamedTuple):
    prev: jnp.ndarray  # (...,) complex64 — previous sample (for conj product)


def make_state(batch_shape=()) -> DiscriminatorState:
    return DiscriminatorState(jnp.ones(batch_shape, dtype=jnp.complex64))


def discriminator_delta(
    state: DiscriminatorState, x: jnp.ndarray, fm_scaling: float | jnp.ndarray
) -> tuple[DiscriminatorState, jnp.ndarray, jnp.ndarray]:
    """phaseDiscriminatorDelta semantics: out = wrap(Δ atan2)/π * fmScaling.

    x: (..., T) complex64. Returns (state', demod, magsq) both (..., T) f32.
    Uses the exact atan2 (the reference's atan2_approximation2 is a speed
    hack for scalar CPUs; the VPU computes real atan2 at full rate).
    """
    arg = jnp.arctan2(jnp.imag(x), jnp.real(x))
    prev_arg = jnp.arctan2(jnp.imag(state.prev), jnp.real(state.prev))
    args = jnp.concatenate([prev_arg[..., None], arg], axis=-1)
    dev = jnp.diff(args, axis=-1) / jnp.float32(np.pi)
    dev = jnp.where(dev < -1.0, dev + 2.0, dev)
    dev = jnp.where(dev > 1.0, dev - 2.0, dev)
    magsq = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(jnp.float32)
    new_state = DiscriminatorState(x[..., -1])
    return new_state, (dev * fm_scaling).astype(jnp.float32), magsq


def discriminator_conj(
    state: DiscriminatorState, x: jnp.ndarray, fm_scaling: float | jnp.ndarray
) -> tuple[DiscriminatorState, jnp.ndarray]:
    """phaseDiscriminator semantics: atan2(conj(prev) * cur)/π * fmScaling."""
    prev = jnp.concatenate([state.prev[..., None], x[..., :-1]], axis=-1)
    d = jnp.conj(prev) * x
    out = jnp.arctan2(jnp.imag(d), jnp.real(d)) / jnp.float32(np.pi)
    return DiscriminatorState(x[..., -1]), (out * fm_scaling).astype(jnp.float32)
