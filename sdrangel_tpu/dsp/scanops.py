"""Parallel formulations of the reference's per-sample sequential recurrences.

The reference walks samples one by one (squelch gate counters, AGC ramps —
nfmdemod.cpp:178-240, agc.cpp:98-175). On TPU a per-sample loop would leave
the VPU idle; these helpers re-express the recurrences as log-depth
associative scans.

Execution shape (r3): every associative_scan here runs as a TWO-LEVEL scan
over (chunks, K) with the scanned axis moved to a MAJOR position. A single
associative_scan along the minor (lane) axis slices lanes at stride 2 per
level — embedded in a large program the TPU backend took 60+ s of compile
for the chain64 step and ~50 us/step more at runtime (bisected:
tools/micro_scan.py — the scan ALONE compiles in 1-3 s;
tools/micro_squelch_compile.py — in-context minor/major/barrier variants
all compile 63-73 s, the two-level form 5.3 s and runs 66 us vs 110-130).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _two_level_scan(compose, elems, identity):
    """Inclusive associative scan of a tuple of (..., T) arrays along the
    last axis, executed as chunk-level + cross-chunk scans with every
    lax.associative_scan running on a major (non-lane) axis.

    identity: tuple of scalars such that compose(identity, g) == g,
    compose(f, identity) == f, and applying identity leaves the carry
    unchanged (used for the exclusive chunk prefix AND for padding).
    Returns the scanned tuple, (..., T) layout.
    """
    t = elems[0].shape[-1]
    b = elems[0].shape[:-1]
    if t < 1024:
        # short blocks: one scan, moved off the lane axis (cheap at these
        # lengths; the compile bomb needs both depth and width)
        em = tuple(jnp.moveaxis(e, -1, 0) for e in elems)
        out = jax.lax.associative_scan(compose, em, axis=0)
        return tuple(jnp.moveaxis(o, 0, -1) for o in out)
    # pad to a multiple of the chunk with identity elements so EVERY large
    # block takes the two-level path (a single full-length scan is the
    # 60 s compile bomb this module exists to avoid — review finding r3:
    # a block whose 2-adic factor is small must not fall back to it)
    k = 512
    pad = (-t) % k
    if pad:
        elems = tuple(
            jnp.concatenate(
                [e, jnp.full((*b, pad), i, dtype=e.dtype)], axis=-1)
            for e, i in zip(elems, identity)
        )
    tp = t + pad
    c = tp // k
    em = tuple(jnp.moveaxis(e.reshape(*b, c, k), -1, 0) for e in elems)  # (K, ..., C)
    within = jax.lax.associative_scan(compose, em, axis=0)
    # chunk-total tuples (..., C) -> exclusive scan over chunks (major axis)
    ct = tuple(jnp.moveaxis(w[-1], -1, 0) for w in within)  # (C, ...)
    pre = jax.lax.associative_scan(compose, ct, axis=0)
    pre = tuple(
        jnp.concatenate([jnp.full_like(p[:1], i), p[:-1]])
        for p, i in zip(pre, identity)
    )
    # combine: chunk prefix (broadcast over K) composed with within-chunk
    pre_b = tuple(jnp.moveaxis(p, 0, -1)[None] for p in pre)  # (1, ..., C)
    full = compose(pre_b, within)  # (K, ..., C)
    return tuple(
        jnp.moveaxis(f, 0, -1).reshape(*b, tp)[..., :t] for f in full)


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

    deltas: (..., T); init: (...,) counter entering the block.
    Returns (..., T) float32 counter series (after each step).
    """
    a = deltas.astype(jnp.float32)
    l = jnp.full_like(a, jnp.float32(lo))
    h = jnp.full_like(a, jnp.float32(hi))
    aa, ll, hh = _two_level_scan(
        _clamp_compose, (a, l, h), (0.0, -jnp.inf, jnp.inf)
    )
    return jnp.clip(init[..., None] + aa, ll, hh)


def _ema_compose(f, g):
    df, af = f
    dg, ag = g
    return df * dg, af * dg + ag


def ema(x: jnp.ndarray, alpha: float, init: jnp.ndarray) -> jnp.ndarray:
    """y[t] = (1-alpha)*y[t-1] + alpha*x[t] as an associative scan."""
    decay = jnp.full(x.shape, 1.0 - alpha, dtype=jnp.float32)
    add = (x * alpha).astype(jnp.float32)
    d, a = _two_level_scan(_ema_compose, (decay, add), (1.0, 0.0))
    return init[..., None] * d + a
