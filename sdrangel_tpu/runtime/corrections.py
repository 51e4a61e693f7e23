"""Automatic DC offset and IQ imbalance correction.

Reference: DSPDeviceSourceEngine::iqCorrections
(sdrbase/dsp/dspdevicesourceengine.cpp:175-250): running averages estimate the
DC offset per rail; phase imbalance is the regression <I·Q>/<I·I> removed as
y_i = x_i − φ·x_q; amplitude imbalance is √(<I²>/<Q²>) applied to Q.

Block form: per-block statistics folded into cross-block EMAs carried in
state; the correction applied to sample t uses the estimates entering the
block (one-block lag instead of the reference's one-sample lag — equivalent
smoothing at a 250 ms moving-average scale).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CorrectionsState(NamedTuple):
    dc: jnp.ndarray  # complex64 () DC estimate
    phi: jnp.ndarray  # f32 phase-imbalance estimate
    amp: jnp.ndarray  # f32 amplitude ratio estimate


def make_state() -> CorrectionsState:
    return CorrectionsState(
        jnp.zeros((), jnp.complex64), jnp.zeros((), jnp.float32), jnp.ones((), jnp.float32)
    )


def apply(
    state: CorrectionsState,
    x: jnp.ndarray,
    dc_correction: bool,
    iq_correction: bool,
    alpha: float = 0.1,
) -> tuple[CorrectionsState, jnp.ndarray]:
    if not dc_correction and not iq_correction:
        return state, x
    dc_new = (1 - alpha) * state.dc + alpha * jnp.mean(x)
    y = x - state.dc if dc_correction else x
    phi, amp = state.phi, state.amp
    if iq_correction:
        i, q = jnp.real(y), jnp.imag(y)
        ii = jnp.mean(i * i)
        iq = jnp.mean(i * q)
        phi_new = (1 - alpha) * state.phi + alpha * (iq / jnp.maximum(ii, 1e-30))
        i2 = i - state.phi * q
        ii2 = jnp.mean(i2 * i2)
        qq2 = jnp.mean(q * q)
        amp_new = (1 - alpha) * state.amp + alpha * jnp.sqrt(
            jnp.maximum(ii2, 1e-30) / jnp.maximum(qq2, 1e-30)
        )
        y = (i2 + 1j * (q * state.amp)).astype(jnp.complex64)
        phi, amp = phi_new, amp_new
    return CorrectionsState(dc_new.astype(jnp.complex64), phi, amp), y
