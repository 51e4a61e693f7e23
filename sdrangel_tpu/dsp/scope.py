"""Scope ops — headless ScopeVisNG math: projections and triggers.

Reference: sdrbase/dsp/projector.h:25-31 (Real/Imag/MagLin/MagDB/MagSq/
Phase/DPhase projections), sdrgui/dsp/scopevisng.h:516-534 (trigger
conditions chain a projection with threshold/edge + holdoff). Feeds the REST
scope endpoint instead of the GL widget.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
import numpy as np


class Projection(enum.Enum):
    REAL = "real"
    IMAG = "imag"
    MAG_LIN = "maglin"
    MAG_SQ = "magsq"
    MAG_DB = "magdb"
    PHASE = "phase"
    DPHASE = "dphase"


def project(x: jnp.ndarray, kind: Projection) -> jnp.ndarray:
    """x: (..., T) complex64 -> (..., T) float32 trace."""
    if kind is Projection.REAL:
        return jnp.real(x).astype(jnp.float32)
    if kind is Projection.IMAG:
        return jnp.imag(x).astype(jnp.float32)
    magsq = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    if kind is Projection.MAG_SQ:
        return magsq.astype(jnp.float32)
    if kind is Projection.MAG_LIN:
        return jnp.sqrt(magsq).astype(jnp.float32)
    if kind is Projection.MAG_DB:
        return (10.0 * jnp.log10(jnp.maximum(magsq, 1e-30))).astype(jnp.float32)
    phase = jnp.arctan2(jnp.imag(x), jnp.real(x)) / np.float32(np.pi)
    if kind is Projection.PHASE:
        return phase.astype(jnp.float32)
    if kind is Projection.DPHASE:
        d = jnp.diff(phase, axis=-1, prepend=phase[..., :1])
        d = jnp.where(d < -1.0, d + 2.0, d)
        d = jnp.where(d > 1.0, d - 2.0, d)
        return d.astype(jnp.float32)
    raise ValueError(kind)


@dataclasses.dataclass(frozen=True)
class TriggerCondition:
    projection: Projection = Projection.REAL
    level: float = 0.0
    positive_edge: bool = True
    holdoff: int = 0  # samples the condition must hold


def find_trigger(x: jnp.ndarray, cond: TriggerCondition) -> jnp.ndarray:
    """First index where the projected trace crosses `level` on the selected
    edge (holding for `holdoff` samples); -1 if no trigger in the block."""
    trace = project(x, cond.projection)
    above = trace >= cond.level
    if not cond.positive_edge:
        above = ~above
    prev = jnp.concatenate([above[..., :1] & False, above[..., :-1]], axis=-1)
    edges = above & ~prev
    if cond.holdoff > 1:
        # condition must persist: windowed all() via cumsum trick
        ai = above.astype(jnp.int32)
        c = jnp.cumsum(ai, axis=-1)
        zeros = jnp.zeros_like(c[..., :1])
        c = jnp.concatenate([zeros, c], axis=-1)
        runlen = c[..., cond.holdoff :] - c[..., : -cond.holdoff]
        ok = jnp.concatenate(
            [runlen >= cond.holdoff,
             jnp.zeros((*edges.shape[:-1], cond.holdoff), bool)], axis=-1
        )
        edges = edges & ok
    idx = jnp.argmax(edges, axis=-1)
    has = jnp.any(edges, axis=-1)
    return jnp.where(has, idx, -1).astype(jnp.int32)


def capture(
    x: jnp.ndarray, cond: TriggerCondition, length: int, pre: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Triggered capture: returns (trigger_index, trace slice of `length`
    starting `pre` samples before the trigger, zero-padded at edges)."""
    idx = find_trigger(x, cond)
    start = jnp.clip(jnp.where(idx < 0, 0, idx - pre), 0, x.shape[-1] - 1)
    offs = jnp.arange(length)
    gather = jnp.clip(start[..., None] + offs, 0, x.shape[-1] - 1)
    return idx, jnp.take_along_axis(x, gather, axis=-1)
