"""Squelch gating with delay-line semantics (the NFM/DSD pattern).

Reference: nfmdemod.cpp:178-240 — per sample, a squelch counter ramps up
while the open-condition holds (clamped at 2*gate) and down otherwise
(clamped at 0); the channel is open when count > gate; audio is read
`gate` samples *back* from a delay line into which the (possibly zeroed)
demod is written — so the gate's attack chops the leading edge instead of
letting a noise burst through (util/doublebufferfifo.h delay line).

Block form: the open-condition series is known for the whole block, the
counter is a saturating associative scan, and the delay line is a carried
`gate`-sample tail.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .scanops import saturating_counter


class SquelchState(NamedTuple):
    count: jnp.ndarray  # (...,) saturating counter
    delay: jnp.ndarray  # (..., gate) delayed audio tail


def make_state(gate: int, batch_shape=()) -> SquelchState:
    return SquelchState(
        jnp.zeros(batch_shape, dtype=jnp.float32),
        jnp.zeros((*batch_shape, gate), dtype=jnp.float32),
    )


def gate_block(
    state: SquelchState,
    audio: jnp.ndarray,
    open_cond: jnp.ndarray,
    gate: int,
) -> tuple[SquelchState, jnp.ndarray, jnp.ndarray]:
    """Run the squelch over one audio block.

    audio: (..., T) float32 demod samples; open_cond: (..., T) bool — the
    per-sample open condition (magsq >= level, or AF squelch verdict).
    Returns (state', gated_audio, squelch_open) where gated_audio is delayed
    by `gate` samples as in the reference.
    """
    deltas = jnp.where(open_cond, 1.0, -1.0)
    counts = saturating_counter(deltas, 0.0, 2.0 * gate, state.count)
    is_open = counts > gate  # (..., T)
    written = jnp.where(open_cond, audio, 0.0)  # delay-line writes
    ext = jnp.concatenate([state.delay, written], axis=-1)
    delayed = ext[..., : audio.shape[-1]]  # readBack(gate)
    gated = jnp.where(is_open, delayed, 0.0)
    new_state = SquelchState(counts[..., -1], ext[..., audio.shape[-1] :])
    return new_state, gated.astype(jnp.float32), is_open
