"""Parallel formulations of the reference's per-sample sequential recurrences.

The reference walks samples one by one (squelch gate counters, AGC ramps —
nfmdemod.cpp:178-240, agc.cpp:98-175). On TPU a per-sample loop would leave
the VPU idle; these helpers re-express the recurrences as log-depth
associative scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def saturating_counter(
    deltas: jnp.ndarray, lo: float, hi: float, init: jnp.ndarray
) -> jnp.ndarray:
    """count[t] = clamp(count[t-1] + deltas[t], lo, hi), vectorized.

    The map x -> clamp(x + a, l, h) is closed under composition, so the whole
    recurrence is an associative scan over (a, l, h) triples — log-depth on
    the VPU instead of a length-T serial loop.

    deltas: (..., T); init: (...,) counter entering the block.
    Returns (..., T) float32 counter series (after each step).
    """
    a = deltas.astype(jnp.float32)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))

    def compose(f, g):
        # g∘f where f=(af,lf,hf) applied first, then g.
        af, lf, hf = f
        ag, lg, hg = g
        aa = af + ag
        ll = jnp.clip(lf + ag, lg, hg)
        hh = jnp.clip(hf + ag, lg, hg)
        return aa, ll, hh

    aa, ll, hh = jax.lax.associative_scan(compose, (a, l, h), axis=-1)
    return jnp.clip(init[..., None] + aa, ll, hh)


def ema(x: jnp.ndarray, alpha: float, init: jnp.ndarray) -> jnp.ndarray:
    """y[t] = (1-alpha)*y[t-1] + alpha*x[t] as an associative scan."""
    t = x.shape[-1]
    decay = jnp.full(x.shape, 1.0 - alpha, dtype=jnp.float32)
    add = (x * alpha).astype(jnp.float32)

    def compose(f, g):
        df, af = f
        dg, ag = g
        return df * dg, af * dg + ag

    d, a = jax.lax.associative_scan(compose, (decay, add), axis=-1)
    return init[..., None] * d + a
