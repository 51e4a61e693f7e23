"""fftfilt overlap-add tests: continuity, passband/stopband, SSB rejection."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.dsp import fftfilt
from sdrangel_tpu.dsp.types import np_tone

FLEN = 256


def _run(x, h, state=None):
    state = state or fftfilt.make_state(FLEN)
    return fftfilt.run_filt(state, jnp.asarray(x), jnp.asarray(h))


def test_block_continuity():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    h = fftfilt.create_filter(0.0, 0.25, FLEN)
    _, y_full = _run(x, h)
    st = fftfilt.make_state(FLEN)
    st, y1 = fftfilt.run_filt(st, jnp.asarray(x[:1024]), jnp.asarray(h))
    _, y2 = fftfilt.run_filt(st, jnp.asarray(x[1024:]), jnp.asarray(h))
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1), np.asarray(y2)]), atol=1e-5
    )


def test_lowpass_pass_and_stop():
    h = fftfilt.create_filter(0.0, 0.1, FLEN)
    x_pass = np_tone(0.05, 1.0, 4096)
    x_stop = np_tone(0.35, 1.0, 4096)
    _, y_pass = _run(x_pass, h)
    _, y_stop = _run(x_stop, h)
    tail = slice(FLEN, None)
    assert np.abs(np.asarray(y_pass))[tail].mean() > 0.4  # ~unity
    assert np.abs(np.asarray(y_stop))[tail].mean() < 0.01


def test_ssb_usb_rejects_negative_freqs():
    h = fftfilt.create_filter(0.01, 0.2, FLEN)
    pos = np_tone(0.1, 1.0, 4096)
    neg = np_tone(-0.1, 1.0, 4096)
    st = fftfilt.make_state(FLEN)
    _, y_pos = fftfilt.run_ssb(st, jnp.asarray(pos), np.asarray(h), usb=True)
    st = fftfilt.make_state(FLEN)
    _, y_neg = fftfilt.run_ssb(st, jnp.asarray(neg), np.asarray(h), usb=True)
    tail = slice(FLEN, None)
    assert np.abs(np.asarray(y_pos))[tail].mean() > 0.35
    assert np.abs(np.asarray(y_neg))[tail].mean() < 0.01


def test_ssb_lsb_mirror():
    h = fftfilt.create_filter(0.01, 0.2, FLEN)
    pos = np_tone(0.1, 1.0, 4096)
    neg = np_tone(-0.1, 1.0, 4096)
    st = fftfilt.make_state(FLEN)
    _, y_pos = fftfilt.run_ssb(st, jnp.asarray(pos), np.asarray(h), usb=False)
    st = fftfilt.make_state(FLEN)
    _, y_neg = fftfilt.run_ssb(st, jnp.asarray(neg), np.asarray(h), usb=False)
    tail = slice(FLEN, None)
    assert np.abs(np.asarray(y_pos))[tail].mean() < 0.01
    assert np.abs(np.asarray(y_neg))[tail].mean() > 0.35


def test_oracle_overlap_add_scalar():
    """Match a direct scalar port of runFilt (fftfilt.cpp:261-282)."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
    h = fftfilt.create_filter(0.02, 0.2, FLEN)
    hop = FLEN // 2
    ovl = np.zeros(hop, dtype=np.complex128)
    out = []
    for f in range(len(x) // hop):
        chunk = np.zeros(FLEN, dtype=np.complex128)
        chunk[:hop] = x[f * hop : (f + 1) * hop]
        y = np.fft.ifft(np.fft.fft(chunk) * h)
        out.append(y[:hop] + ovl)
        ovl = y[hop:]
    oracle = np.concatenate(out)
    _, y = _run(x, h)
    np.testing.assert_allclose(np.asarray(y), oracle.astype(np.complex64), atol=1e-5)


def test_rrc_filter_shape():
    h = np.asarray(fftfilt.create_rrc_filter(0.2, 0.35, FLEN))
    assert abs(h[0]) == 1.0  # unity at DC after normalization
    assert abs(h[FLEN // 2]) < 1e-6  # zero far out of band
