"""NCO tests: phase continuity, frequency accuracy, LUT parity oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.dsp import nco


def test_block_continuity():
    st = nco.make_nco()
    inc = nco.freq_to_increment(1234.5, 48000.0)
    st1, a = jax.jit(nco.nco_block, static_argnums=2)(st, inc, 256)
    _, b = jax.jit(nco.nco_block, static_argnums=2)(st1, inc, 256)
    both = np.concatenate([np.asarray(a), np.asarray(b)])
    st = nco.make_nco()
    _, full = jax.jit(nco.nco_block, static_argnums=2)(st, inc, 512)
    np.testing.assert_allclose(both, np.asarray(full), atol=1e-5)


def test_frequency_accuracy():
    fs, f = 48000.0, 997.0
    st = nco.make_nco()
    _, iq = nco.nco_block(st, nco.freq_to_increment(f, fs), 1 << 14)
    iq = np.asarray(iq)
    # instantaneous frequency from phase differences
    dphi = np.angle(iq[1:] * np.conj(iq[:-1]))
    f_est = np.mean(dphi) / (2 * np.pi) * fs
    assert abs(f_est - f) < 0.01
    np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-5)


def test_negative_frequency():
    fs, f = 48000.0, -5000.0
    st = nco.make_nco()
    _, iq = nco.nco_block(st, nco.freq_to_increment(f, fs), 4096)
    iq = np.asarray(iq)
    dphi = np.angle(iq[1:] * np.conj(iq[:-1]))
    f_est = np.mean(dphi) / (2 * np.pi) * fs
    assert abs(f_est - f) < 0.01


def test_lut_parity_against_scalar_oracle():
    """Bit-parity with the reference's quantized NCO semantics
    (nco.cpp:36-64): integer increment, increment-then-read, 4096-entry cos
    table, imag = -table[(phase + N/4) % N]."""
    fs, f = 48000.0, 1250.0
    increment = nco.lut_increment(f, fs)
    table = np.cos(2.0 * np.pi * np.arange(nco.TABLE_SIZE) / nco.TABLE_SIZE).astype(
        np.float32
    )
    phase = 0
    expect = []
    for _ in range(1000):
        phase = (phase + increment) % nco.TABLE_SIZE
        expect.append(table[phase] - 1j * table[(phase + nco.TABLE_SIZE // 4) % nco.TABLE_SIZE])
    expect = np.asarray(expect, dtype=np.complex64)

    st = nco.make_nco_lut()
    _, iq = jax.jit(nco.nco_lut_block, static_argnums=(1, 2))(st, increment, 1000)
    np.testing.assert_array_equal(np.asarray(iq), expect)


def test_mix_shifts_spectrum():
    fs = 48000.0
    n = 4096
    t = np.arange(n)
    x = np.exp(1j * 2 * np.pi * 3000.0 / fs * t).astype(np.complex64)
    st = nco.make_nco()
    _, y = nco.mix_block(st, jnp.asarray(x), nco.freq_to_increment(-3000.0, fs))
    y = np.asarray(y)
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    assert abs(np.mean(dphi)) * fs / (2 * np.pi) < 1.0  # shifted to DC
