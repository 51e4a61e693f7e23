"""Spectrum op tests (SpectrumVis math parity)."""

import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.dsp import spectrum
from sdrangel_tpu.dsp.fftwindow import Function
from sdrangel_tpu.dsp.types import np_tone


def test_tone_peak_location():
    cfg = spectrum.SpectrumConfig(fft_size=512, window=Function.HANNING)
    st = spectrum.make_state(cfg)
    x = np_tone(0.1, 1.0, 4096, amp=0.8)
    _, spec = spectrum.power_spectrum(st, jnp.asarray(x), cfg)
    spec = np.asarray(spec)
    assert spec.shape == (512,)
    # negative frequencies first: +0.1 of fs lands at bin 256 + 51
    peak = spec.argmax()
    assert abs(peak - (256 + 51)) <= 1


def test_negative_freq_side():
    cfg = spectrum.SpectrumConfig(fft_size=512)
    st = spectrum.make_state(cfg)
    x = np_tone(-0.2, 1.0, 2048)
    _, spec = spectrum.power_spectrum(st, jnp.asarray(x), cfg)
    peak = int(np.asarray(spec).argmax())
    assert abs(peak - (256 - 102)) <= 1


def test_moving_average_smooths():
    cfg = spectrum.SpectrumConfig(fft_size=256, averaging_mode="moving", averaging_n=8)
    st = spectrum.make_state(cfg)
    rng = np.random.default_rng(3)
    specs = []
    for _ in range(10):
        x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
        st, s = spectrum.power_spectrum(st, jnp.asarray(x), cfg)
        specs.append(np.asarray(s))
    # averaged spectrum of white noise is much flatter than a single frame
    cfg1 = spectrum.SpectrumConfig(fft_size=256, averaging_mode="none")
    st1 = spectrum.make_state(cfg1)
    _, s1 = spectrum.power_spectrum(st1, jnp.asarray(x), cfg1)
    assert np.std(specs[-1]) < np.std(np.asarray(s1))


def test_linear_mode_unit_tone():
    cfg = spectrum.SpectrumConfig(
        fft_size=256, window=Function.RECTANGLE, linear=True
    )
    st = spectrum.make_state(cfg)
    x = np_tone(64.0 / 256.0, 1.0, 1024, amp=1.0)  # exactly bin 64
    _, spec = spectrum.power_spectrum(st, jnp.asarray(x), cfg)
    # |X[k]|^2 / N^2 = amp^2 at the tone bin for a rectangular window
    assert abs(float(np.asarray(spec).max()) - 1.0) < 0.05


def test_overlap_frames():
    """cfg.overlap advances frames by fft_size - overlap (SpectrumVis
    refill semantics) — previously accepted but ignored."""
    import jax

    from sdrangel_tpu.dsp import spectrum as sp

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64)
    # averaging over MORE frames with 50% overlap: compare fixed-average
    # counts by inspecting the state's frame count after one block
    cfg0 = sp.SpectrumConfig(fft_size=1024, averaging_mode="fixed",
                             averaging_n=1 << 30)
    cfg1 = sp.SpectrumConfig(fft_size=1024, averaging_mode="fixed",
                             averaging_n=1 << 30, overlap=512)
    run0 = jax.jit(lambda s, xx: sp.power_spectrum(s, xx, cfg0))
    run1 = jax.jit(lambda s, xx: sp.power_spectrum(s, xx, cfg1))
    s0, _ = run0(sp.make_state(cfg0), jnp.asarray(x))
    s1, _ = run1(sp.make_state(cfg1), jnp.asarray(x))
    assert int(s0.avg_count) == 4      # 4096/1024 disjoint frames
    assert int(s1.avg_count) == 7      # (4096-1024)/512 + 1 overlapped

    # a tone's bin is identical either way (windowed FFT per frame)
    t = np.arange(4096)
    tone = np.exp(2j * np.pi * 0.125 * t).astype(np.complex64)
    _, v0 = run0(sp.make_state(cfg0), jnp.asarray(tone))
    _, v1 = run1(sp.make_state(cfg1), jnp.asarray(tone))
    assert np.argmax(np.asarray(v0)) == np.argmax(np.asarray(v1))
