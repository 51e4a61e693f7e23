"""DC/IQ auto-correction tests against testsource impairments — the
reference validates its iqCorrections path the same way (testsource DC /
phase-imbalance knobs, testsourcethread.cpp:219-266; corrections in
dspdevicesourceengine.cpp:175-250)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.io import testsource
from sdrangel_tpu.runtime import corrections


def _image_and_dc(x: np.ndarray, f_bin: float, fs: float):
    n = len(x)
    spec = np.abs(np.fft.fft(x * np.hanning(n))) ** 2
    freqs = np.fft.fftfreq(n, 1.0 / fs)
    sig = spec[np.abs(freqs - f_bin) < 4 * fs / n].sum()
    img = spec[np.abs(freqs + f_bin) < 4 * fs / n].sum()
    dc = spec[np.abs(freqs) < 2 * fs / n].sum()
    return sig, img, dc


def test_dc_and_iq_impairments_removed():
    fs = 192000.0
    cfg = testsource.TestSourceConfig(
        sample_rate=fs, carrier_freq=30_000.0, modulation="none",
        amplitude=0.4, dc_factor=0.1, phase_imbalance=0.08, i_factor=0.05,
    )
    n = 1 << 14
    blocks = 40
    x = testsource.generate(cfg, blocks * n)

    state = corrections.make_state()
    run = jax.jit(lambda s, xx: corrections.apply(s, xx, True, True))
    out = None
    for b in range(blocks):  # per-block EMAs converge over ~1/alpha blocks
        state, out = run(state, jnp.asarray(x[b * n : (b + 1) * n]))
    y = np.asarray(jnp.stack([jnp.real(out), jnp.imag(out)]))
    y = y[0] + 1j * y[1]

    sig0, img0, dc0 = _image_and_dc(x[(blocks - 1) * n :], 30_000.0, fs)
    sig1, img1, dc1 = _image_and_dc(y, 30_000.0, fs)
    # signal survives, DC and the -30 kHz image drop substantially
    assert sig1 > 0.5 * sig0
    assert dc1 < dc0 / 100.0, (dc0, dc1)
    assert img1 < img0 / 10.0, (
        10 * np.log10(img0 / sig0), 10 * np.log10(img1 / sig1))


def test_corrections_noop_when_disabled():
    state = corrections.make_state()
    x = jnp.asarray((np.ones(64) + 1j * np.ones(64)).astype(np.complex64))
    state2, y = corrections.apply(state, x, False, False)
    assert y is x and state2 is state
