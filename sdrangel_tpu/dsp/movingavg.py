"""Windowed moving average with block-boundary carry.

Reference: sdrbase/util/movingaverage.h — fixed-length running mean used by
squelches, AGCs and channel power meters. Exact windowed semantics are kept
(not an EMA): the carry is the previous window of values, the block result is
a cumulative-sum difference — fully vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MovingAvgState(NamedTuple):
    window: jnp.ndarray  # (..., N) last N inputs (oldest first)


def make_state(length: int, batch_shape=(), fill: float = 0.0) -> MovingAvgState:
    return MovingAvgState(jnp.full((*batch_shape, length), fill, dtype=jnp.float32))


def moving_average(
    state: MovingAvgState, x: jnp.ndarray
) -> tuple[MovingAvgState, jnp.ndarray]:
    """Running mean over the trailing N samples at every position of x.

    x: (..., T) float32. Returns (state', avg) with avg[t] = mean of the N
    samples ending at t (spanning the block boundary through the carry).
    """
    n = state.window.shape[-1]
    ext = jnp.concatenate([state.window, x], axis=-1)
    c = jnp.cumsum(ext, axis=-1)
    zeros = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zeros, c], axis=-1)
    sums = c[..., n + 1 :] - c[..., 1 : x.shape[-1] + 1]
    new_window = ext[..., x.shape[-1] :]
    return MovingAvgState(new_window), (sums / n).astype(jnp.float32)
