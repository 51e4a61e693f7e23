"""Tests for the block reformulations of per-sample recurrences:
phase discriminator, moving average, saturating counters, AGC, squelch,
Goertzel detectors, IIR filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.dsp import agc, goertzel, iir, movingavg, phasediscri, scanops, squelch
from sdrangel_tpu.dsp.types import np_tone


# --- phase discriminator ---------------------------------------------------

def test_discriminator_fm_tone():
    fs = 48000.0
    f_dev = 3000.0
    f_mod = 1000.0
    n = 8192
    t = np.arange(n) / fs
    phase = 2 * np.pi * f_dev / (2 * np.pi * f_mod) * np.sin(2 * np.pi * f_mod * t)
    x = np.exp(1j * phase).astype(np.complex64)
    st = phasediscri.make_state()
    st, demod, magsq = phasediscri.discriminator_delta(st, jnp.asarray(x), 1.0)
    demod = np.asarray(demod)[1:]
    # demod = 2*f_inst/fs at scaling 1; the first difference estimates the
    # derivative at the midpoint t-1/2
    t_mid = (np.arange(n) - 0.5) / fs
    expect = 2.0 * f_dev / fs * np.cos(2 * np.pi * f_mod * t_mid)[1:]
    np.testing.assert_allclose(demod, expect, atol=1e-3)
    np.testing.assert_allclose(np.asarray(magsq), 1.0, atol=1e-5)


def test_discriminator_block_continuity():
    x = np_tone(5000.0, 48000.0, 1024)
    st = phasediscri.make_state()
    st, d1, _ = phasediscri.discriminator_delta(st, jnp.asarray(x[:512]), 1.0)
    _, d2, _ = phasediscri.discriminator_delta(st, jnp.asarray(x[512:]), 1.0)
    st0 = phasediscri.make_state()
    _, d_full, _ = phasediscri.discriminator_delta(st0, jnp.asarray(x), 1.0)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(d1), np.asarray(d2)]), np.asarray(d_full), atol=1e-6
    )


# --- moving average / scans ------------------------------------------------

def test_moving_average_matches_oracle():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(300).astype(np.float32)
    n = 16
    st = movingavg.make_state(n)
    _, avg = movingavg.moving_average(st, jnp.asarray(x))
    ext = np.concatenate([np.zeros(n, np.float32), x])
    oracle = np.array([ext[t + 1 : t + 1 + n].mean() for t in range(300)])
    np.testing.assert_allclose(np.asarray(avg), oracle, atol=1e-5)


def test_saturating_counter_matches_loop():
    rng = np.random.default_rng(13)
    deltas = rng.choice([-1.0, 1.0], size=500).astype(np.float32)
    out = scanops.saturating_counter(jnp.asarray(deltas), 0.0, 20.0, jnp.asarray(3.0))
    c, oracle = 3.0, []
    for d in deltas:
        c = min(max(c + d, 0.0), 20.0)
        oracle.append(c)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-5)


@pytest.mark.slow
def test_ema_matches_loop():
    rng = np.random.default_rng(17)
    x = rng.standard_normal(200).astype(np.float32)
    y = scanops.ema(jnp.asarray(x), 0.125, jnp.asarray(0.5))
    acc, oracle = 0.5, []
    for v in x:
        acc = 0.875 * acc + 0.125 * v
        oracle.append(acc)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-4)


# --- Goertzel --------------------------------------------------------------

def test_goertzel_matches_reference_recurrence():
    """Power formula equals the reference's u0²+u1²−coef·u0·u1 per frame
    (ctcssdetector.cpp:137-160)."""
    fs, n = 6000.0, 600
    rng = np.random.default_rng(23)
    x = (0.3 * np.sin(2 * np.pi * 100.0 / fs * np.arange(n)) +
         0.05 * rng.standard_normal(n)).astype(np.float32)
    tones = (67.0, 100.0, 203.5)
    p = goertzel.goertzel_power(jnp.asarray(x)[None, :], tones, fs)
    for j, tone in enumerate(tones):
        coef = 2.0 * np.cos(2.0 * np.pi * tone / fs)
        u0 = u1 = 0.0
        for v in x:
            u0, u1 = v + coef * u0 - u1, u0
        oracle = u0 * u0 + u1 * u1 - coef * u0 * u1
        np.testing.assert_allclose(np.asarray(p)[0, j], oracle, rtol=2e-3)


def test_ctcss_detects_tone():
    fs = 6000.0
    n = 2048
    x = np.sin(2 * np.pi * 100.0 / fs * np.arange(n)).astype(np.float32)
    res = goertzel.ctcss_detect(jnp.asarray(x).reshape(1, n), fs)
    assert bool(res.detected[0])
    assert float(goertzel.CTCSS_TONES[int(res.tone_index[0])]) == 100.0
    silence = np.zeros((1, n), np.float32)
    res2 = goertzel.ctcss_detect(jnp.asarray(silence), fs)
    assert not bool(res2.detected[0])


# --- AGC -------------------------------------------------------------------

def test_mag_agc_normalizes():
    cfg = agc.MagAGCConfig(order_r=1.0, history_size=256, threshold_enable=False)
    st = agc.make_state(cfg)
    x = 0.05 * np_tone(1000.0, 48000.0, 4096, amp=1.0)
    st, y, _, _ = agc.mag_agc(st, jnp.asarray(x), cfg)
    assert 0.9 < np.abs(np.asarray(y))[1024:].mean() < 1.1


def test_mag_agc_squelch_closes_on_silence():
    cfg = agc.MagAGCConfig(
        order_r=1.0, history_size=128, threshold=1e-4, threshold_enable=True,
        gate=4, step_length=32, step_down_delay=64,
    )
    st = agc.make_state(cfg)
    noise = (1e-5 * np.random.default_rng(1).standard_normal(2048)).astype(np.complex64)
    st, y, _, _ = agc.mag_agc(st, jnp.asarray(noise), cfg)
    assert np.abs(np.asarray(y))[256:].max() < 1e-3  # gated


# --- squelch ---------------------------------------------------------------

def test_squelch_gates_and_delays():
    gate = 16
    st = squelch.make_state(gate)
    t = 512
    audio = np.ones(t, np.float32)
    open_cond = np.zeros(t, bool)
    open_cond[100:400] = True
    st, gated, is_open = squelch.gate_block(
        st, jnp.asarray(audio), jnp.asarray(open_cond), gate
    )
    gated = np.asarray(gated)
    assert gated[:100].max() == 0.0  # closed before signal
    assert gated[150:380].min() == 1.0  # open mid-burst
    assert gated[450:].max() == 0.0  # closed after


def test_squelch_block_continuity():
    gate = 8
    rng = np.random.default_rng(29)
    audio = rng.standard_normal(512).astype(np.float32)
    open_cond = rng.random(512) > 0.3
    st = squelch.make_state(gate)
    st, g1, _ = squelch.gate_block(st, jnp.asarray(audio[:256]), jnp.asarray(open_cond[:256]), gate)
    _, g2, _ = squelch.gate_block(st, jnp.asarray(audio[256:]), jnp.asarray(open_cond[256:]), gate)
    st0 = squelch.make_state(gate)
    _, g_full, _ = squelch.gate_block(st0, jnp.asarray(audio), jnp.asarray(open_cond), gate)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(g1), np.asarray(g2)]), np.asarray(g_full), atol=1e-6
    )


# --- IIR -------------------------------------------------------------------

@pytest.mark.slow
def test_biquad_matches_loop():
    b, a = iir.bandpass_biquad_coeffs(1000.0, 48000.0)
    rng = np.random.default_rng(31)
    x = rng.standard_normal(256).astype(np.float32)
    st = iir.make_biquad()
    _, y = iir.biquad(st, jnp.asarray(x), b, a)
    y1 = y2 = x1 = x2 = 0.0
    oracle = []
    for v in x:
        out = b[0] * v + b[1] * x1 + b[2] * x2 - a[0] * y1 - a[1] * y2
        x2, x1 = x1, v
        y2, y1 = y1, out
        oracle.append(out)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-4)


def test_rc_lowpass_smooths():
    st = iir.make_iir1()
    x = np.ones(256, np.float32)
    _, y = iir.rc_lowpass(st, jnp.asarray(x), 20.0)
    y = np.asarray(y)
    assert y[0] < 0.1 and y[-1] > 0.99  # exponential approach to 1


# --- fftcorr / symsync -----------------------------------------------------

def test_fftcorr_finds_delay():
    from sdrangel_tpu.dsp import fftcorr

    rng = np.random.default_rng(7)
    n = 2048
    a = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    delay = 37
    b = np.roll(a, delay)
    st = fftcorr.make_state(1024)
    _, corr = fftcorr.correlate_block(st, jnp.asarray(b), jnp.asarray(a), 1024)
    lags = np.abs(np.asarray(corr)[-1])
    assert lags.argmax() == delay


def test_symsync_converges():
    from sdrangel_tpu.dsp import symsync

    rng = np.random.default_rng(11)
    sps = 8
    n_sym = 512
    bits = rng.integers(0, 2, n_sym * 3) * 2 - 1
    # rectangular-ish BPSK at sps samples/symbol with a timing offset of 3
    wave = np.repeat(bits.astype(np.float32), sps)
    # smooth transitions so mid-symbol samples carry timing info
    wave = np.convolve(wave, np.ones(sps) / sps, mode="same")
    offset = 3
    x = (wave[offset:] + 0j).astype(np.complex64)
    x = x[: len(x) // sps * sps]
    st = symsync.make_state(sps=sps)
    block = (n_sym - 8) * sps
    for b in range(3):
        st, syms = symsync.synchronize_block(
            st, jnp.asarray(x[b * block : (b + 1) * block]), sps
        )
    # after convergence the sampled symbols are near +-1 (not transitions)
    s = np.real(np.asarray(syms))
    assert np.abs(s).mean() > 0.8, np.abs(s).mean()


def test_fll_tracks_carrier():
    """FreqLockComplex role: the FLL's frequency track converges to a
    rotating carrier's frequency and its oscillator locks the rotation."""
    from sdrangel_tpu.dsp import phaselock

    fs = 48000.0
    f0 = 1234.0
    n = 1 << 15
    t = np.arange(n) / fs
    x = np.exp(1j * (2 * np.pi * f0 * t + 0.4)).astype(np.complex64)
    st = phaselock.make_fll()
    run = jax.jit(lambda s, xx: phaselock.fll_run(s, xx, fs))
    half = n // 2
    st, y, fhat = run(st, jnp.asarray(x[:half]))
    st, y2, fhat2 = run(st, jnp.asarray(x[half:]))
    f_est = float(np.mean(np.asarray(fhat2)[-4096:])) * fs / (2 * np.pi)
    assert abs(f_est - f0) < 2.0, f_est
    # oscillator derotates the carrier to ~DC
    bb = x[half:] * np.conj(np.asarray(y2))
    dphi = np.angle(bb[1:] * np.conj(bb[:-1]))[-4096:]  # settled tail
    assert np.abs(np.mean(dphi)) * fs / (2 * np.pi) < 2.0


def test_kaiser_lowpass_attenuation():
    from sdrangel_tpu.dsp import firdesign

    h = firdesign.kaiser_lowpass(201, 0.1, atten_db=70.0)
    w = np.fft.rfft(h, 8192)
    f = np.linspace(0, 0.5, len(w))
    stop = np.abs(w[f > 0.14])
    assert 20 * np.log10(stop.max()) < -60.0
    assert abs(np.abs(w[0]) - 1.0) < 1e-3
