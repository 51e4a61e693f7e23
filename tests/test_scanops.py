"""Oracle exactness of the two-level scanops across block lengths.

The r3 rewrite (dsp/scanops.py) executes every associative scan as a
two-level (chunks x K) scan on major axes — these tests pin bit-level
agreement with the per-sample reference recurrences (nfmdemod.cpp:178-240
counter semantics) at lengths that exercise every chunking branch:
short (< 8), non-power-of-two, chunk-divisible, and large.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrangel_tpu.dsp.scanops import ema, saturating_counter


def _oracle_sat(deltas, lo, hi, s):
    out = []
    for a in deltas:
        s = min(max(s + a, lo), hi)
        out.append(s)
    return np.array(out, np.float32)


def _oracle_ema(x, alpha, y):
    out = []
    for v in x:
        y = (1.0 - alpha) * y + alpha * v
        out.append(y)
    return np.array(out, np.float32)


@pytest.mark.parametrize(
    "t", [1, 5, 48, 100, 512, 1536, 4096, 6144, 16384,
          12500, 12289])  # 12500 = small 2-adic factor, 12289 = prime:
                          # both must take the padded two-level path
def test_saturating_counter_matches_oracle(t):
    rng = np.random.default_rng(t)
    deltas = rng.choice([-1.0, 1.0], size=(3, t)).astype(np.float32)
    init = rng.integers(0, 9, size=(3,)).astype(np.float32)
    got = np.asarray(saturating_counter(jnp.asarray(deltas), 0.0, 9.0,
                                        jnp.asarray(init)))
    want = np.stack([_oracle_sat(deltas[i], 0.0, 9.0, init[i])
                     for i in range(3)])
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("t", [1, 48, 512, 6144, 16384, 12500, 12289])
def test_ema_matches_oracle(t):
    rng = np.random.default_rng(100 + t)
    x = rng.standard_normal((2, t)).astype(np.float32)
    y0 = rng.standard_normal(2).astype(np.float32)
    got = np.asarray(ema(jnp.asarray(x), 0.1, jnp.asarray(y0)))
    want = np.stack([_oracle_ema(x[i], 0.1, y0[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_saturating_counter_streaming_seam():
    # splitting a stream into blocks with the carried count must equal one
    # long block — the property the session's per-block jit relies on
    rng = np.random.default_rng(7)
    t = 3072
    deltas = rng.choice([-1.0, 1.0], size=(t,)).astype(np.float32)
    whole = np.asarray(saturating_counter(jnp.asarray(deltas), 0.0, 96.0,
                                          jnp.asarray(0.0)))
    out, carry = [], jnp.asarray(0.0)
    for blk in deltas.reshape(4, -1):
        got = saturating_counter(jnp.asarray(blk), 0.0, 96.0, carry)
        carry = got[-1]
        out.append(np.asarray(got))
    np.testing.assert_allclose(np.concatenate(out), whole)
