"""Parallel formulations of the reference's per-sample sequential recurrences.

The reference walks samples one by one (squelch gate counters, AGC ramps —
nfmdemod.cpp:178-240, agc.cpp:98-175). On TPU a per-sample loop would leave
the VPU idle; these helpers re-express the recurrences as log-depth
associative scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _clamp_compose(f, g):
    # g∘f where f=(af,lf,hf) applied first, then g; the clamped-affine map
    # x -> clip(x + a, l, h) is closed under composition.
    af, lf, hf = f
    ag, lg, hg = g
    aa = af + ag
    ll = jnp.clip(lf + ag, lg, hg)
    hh = jnp.clip(hf + ag, lg, hg)
    return aa, ll, hh


def saturating_counter(
    deltas: jnp.ndarray, lo: float, hi: float, init: jnp.ndarray
) -> jnp.ndarray:
    """count[t] = clamp(count[t-1] + deltas[t], lo, hi), vectorized.

    The map x -> clamp(x + a, l, h) is closed under composition, so the whole
    recurrence is an associative scan over (a, l, h) triples — log-depth on
    the VPU instead of a length-T serial loop.

    Execution (r3): TWO-LEVEL scan over (chunks, K) with every
    associative_scan running along a MAJOR axis. A single
    associative_scan along the minor (lane) axis slices lanes at stride 2
    per level — in a large surrounding program the TPU backend took 60+ s
    of compile for the chain64 step and ~50 us/step more at runtime
    (bisected: tools/micro_squelch_compile.py — 2level 5.3 s / 66 us vs
    63-73 s / 110-130 us for minor/major/barrier variants at 2^22).

    deltas: (..., T); init: (...,) counter entering the block.
    Returns (..., T) float32 counter series (after each step).
    """
    a = deltas.astype(jnp.float32)
    t = a.shape[-1]
    k = 512
    while k > 1 and t % k:  # largest power-of-two chunk dividing T
        k //= 2
    if t // max(k, 1) < 2 or k < 8:
        # short blocks: one scan, moved off the lane axis
        am = jnp.moveaxis(a, -1, 0)
        l = jnp.full_like(am, jnp.float32(lo))
        h = jnp.full_like(am, jnp.float32(hi))
        aa, ll, hh = jax.lax.associative_scan(_clamp_compose, (am, l, h), axis=0)
        return jnp.moveaxis(jnp.clip(init[None] + aa, ll, hh), 0, -1)
    b = a.shape[:-1]
    c = t // k
    am = jnp.moveaxis(a.reshape(*b, c, k), -1, 0)  # (K, ..., C)
    l = jnp.full_like(am, jnp.float32(lo))
    h = jnp.full_like(am, jnp.float32(hi))
    aa, ll, hh = jax.lax.associative_scan(_clamp_compose, (am, l, h), axis=0)
    # chunk-total triples (..., C) -> scan over chunks (major axis again)
    ct = (jnp.moveaxis(aa[-1], -1, 0), jnp.moveaxis(ll[-1], -1, 0),
          jnp.moveaxis(hh[-1], -1, 0))  # (C, ...)
    pa, plo, phi = jax.lax.associative_scan(_clamp_compose, ct, axis=0)
    # exclusive prefix: identity map (0, -inf, +inf) for chunk 0
    z = jnp.zeros_like(pa[:1])
    pa = jnp.concatenate([z, pa[:-1]])
    plo = jnp.concatenate([jnp.full_like(z, -jnp.inf), plo[:-1]])
    phi = jnp.concatenate([jnp.full_like(z, jnp.inf), phi[:-1]])
    s0 = jnp.clip(init[None] + pa, plo, phi)  # (C, ...) count entering chunk
    s0 = jnp.moveaxis(s0, 0, -1)  # (..., C)
    out = jnp.clip(s0[None] + aa, ll, hh)  # (K, ..., C)
    return jnp.moveaxis(out, 0, -1).reshape(*b, t)


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
