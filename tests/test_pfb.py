"""Polyphase DFT filter-bank channelizer (dsp/pfb.py): convolution-oracle
exactness, streaming seams, tone selectivity — the one-kernel uniform-grid
alternative to per-channel DownChannelizer trees (SURVEY §7.1,
downchannelizer.cpp:250-287)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.dsp import pfb


def _noise(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


@pytest.mark.parametrize("m,p", [(8, 4), (16, 8), (64, 8)])
def test_pfb_matches_convolution_oracle(m, p):
    x = _noise(m * 48)
    h = pfb.prototype(m, p)
    st = pfb.make_state(m, p)
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m, h))(st, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (48, m)
    for c in (0, 1, m // 2, m - 1):
        o = pfb.oracle_channel(x, m, c, h)
        err = np.abs(y[:, c] - o).max() / max(np.abs(o).max(), 1e-9)
        assert err < 1e-5, (c, err)


def test_pfb_streaming_seam_exact():
    """Two half-blocks through carried state equal one full block."""
    m = 16
    x = _noise(m * 64, seed=2)
    run = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))
    st = pfb.make_state(m)
    _, y_full = run(st, jnp.asarray(x))
    st = pfb.make_state(m)
    st, y1 = run(st, jnp.asarray(x[: m * 32]))
    st, y2 = run(st, jnp.asarray(x[m * 32:]))
    y_split = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert np.abs(y_split - np.asarray(y_full)).max() < 1e-6


def test_pfb_tone_selectivity():
    """A tone at channel c's centre + δ lands in channel c at δ (baseband)
    with adjacent-channel leakage under -50 dB."""
    m = 32
    fs = 320_000.0
    c = 5
    delta = 900.0
    n = m * 512
    t = np.arange(n) / fs
    f0 = c * fs / m + delta
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    st = pfb.make_state(m)
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st, jnp.asarray(x))
    y = np.asarray(y)[64:]  # drop filter warmup
    power = (np.abs(y) ** 2).mean(axis=0)
    assert power.argmax() == c
    leak_db = 10 * np.log10(
        (power.sum() - power[c]) / power[c] + 1e-15)
    assert leak_db < -50, leak_db
    # the recovered baseband tone sits at δ (rate fs/M)
    seg = y[:, c]
    spec = np.abs(np.fft.fft(seg * np.hanning(len(seg)))) ** 2
    freqs = np.fft.fftfreq(len(seg), m / fs)
    assert abs(freqs[spec.argmax()] - delta) < fs / m / len(seg) * 2


def test_pfb_batched_shapes():
    m = 8
    x = np.stack([_noise(m * 16, s) for s in range(3)])
    st = pfb.make_state(m, batch_shape=(3,))
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st, jnp.asarray(x))
    assert y.shape == (3, 16, m)
    # batch row 1 equals the unbatched run
    st1 = pfb.make_state(m)
    _, y1 = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st1, jnp.asarray(x[1]))
    assert np.abs(np.asarray(y)[1] - np.asarray(y1)).max() < 1e-6


def test_pfb_channel_freqs():
    f = pfb.channel_freqs(8, 8000.0)
    assert list(f) == [0, 1000, 2000, 3000, 4000, -3000, -2000, -1000]
