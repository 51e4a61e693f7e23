"""Demodulator end-to-end tests: synthetic modulated signals through the full
channel chains, asserting recovered-audio SNR — richer than the reference's
manual/visual verification (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.channels import demod_am, demod_nfm, demod_ssb, demod_wfm
from sdrangel_tpu.io import testsource


def _tone_snr(audio: np.ndarray, tone_hz: float, fs: float) -> float:
    """SNR of a single tone vs everything else (dB), Hann-windowed."""
    n = len(audio)
    audio = audio - audio.mean()
    spec = np.abs(np.fft.rfft(audio * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    tone_bins = np.abs(freqs - tone_hz) < 4.0 * fs / n
    sig = spec[tone_bins].sum()
    noise = spec[~tone_bins].sum()
    return 10.0 * np.log10(sig / max(noise, 1e-30))


def _run_blocks(process, state, x, cfg, n_blocks, block):
    outs = []
    run = jax.jit(process, static_argnums=2)
    for b in range(n_blocks):
        state, audio = run(state, jnp.asarray(x[b * block : (b + 1) * block]), cfg)
        outs.append(np.asarray(audio))
    return np.concatenate(outs, axis=-1)


def test_nfm_end_to_end():
    channel_rate = 96000.0
    cfg = demod_nfm.NFMConfig(
        channel_rate=channel_rate, fm_deviation=5000.0, squelch_db=-60.0,
        af_bandwidth=3000.0,
    )
    src = testsource.TestSourceConfig(
        sample_rate=channel_rate, carrier_freq=0.0, modulation="fm",
        tone_freq=1000.0, fm_deviation=5000.0, amplitude=0.5,
    )
    block = cfg.resampler_plan.block_in
    x = testsource.generate(src, block * 6)
    audio = _run_blocks(demod_nfm.process, demod_nfm.make_state(cfg), x, cfg, 6, block)
    audio = audio[len(audio) // 3 :]  # drop squelch/filter transients
    snr = _tone_snr(audio, 1000.0, cfg.audio_rate)
    # measured 29.1 dB: the reference's rfBw/2.2 pre-filter (nfmdemod.cpp:425,
    # adopted for golden parity — 137 dB stage match vs 41 at the old /2.0)
    # clips the Carson band of this 5 kHz-deviation tone, trading ~3 dB of
    # synthetic-loopback SNR for reference-exact channel response
    assert snr > 26.0, f"NFM SNR {snr:.1f} dB"
    assert np.abs(audio).max() > 0.1  # squelch opened


def test_nfm_squelch_closes_on_noise():
    channel_rate = 96000.0
    cfg = demod_nfm.NFMConfig(channel_rate=channel_rate, squelch_db=-30.0)
    block = cfg.resampler_plan.block_in
    rng = np.random.default_rng(5)
    x = (1e-4 * (rng.standard_normal(block * 2) + 1j * rng.standard_normal(block * 2))).astype(np.complex64)
    audio = _run_blocks(demod_nfm.process, demod_nfm.make_state(cfg), x, cfg, 2, block)
    assert np.abs(audio[len(audio) // 2 :]).max() < 1e-3


def test_am_end_to_end():
    channel_rate = 48000.0
    cfg = demod_am.AMConfig(channel_rate=channel_rate, squelch_db=-60.0)
    src = testsource.TestSourceConfig(
        sample_rate=channel_rate, modulation="am", tone_freq=1000.0,
        am_depth=0.8, amplitude=0.5,
    )
    block = cfg.resampler_plan.block_in
    x = testsource.generate(src, block * 6)
    audio = _run_blocks(demod_am.process, demod_am.make_state(cfg), x, cfg, 6, block)
    audio = audio[len(audio) // 3 :]
    snr = _tone_snr(audio, 1000.0, cfg.audio_rate)
    assert snr > 25.0, f"AM SNR {snr:.1f} dB"


def test_ssb_end_to_end():
    channel_rate = 48000.0
    cfg = demod_ssb.SSBConfig(
        channel_rate=channel_rate, usb=True, bandwidth=3000.0, low_cutoff=300.0,
        agc_enable=False,
    )
    # USB voice tone: a carrier 1 kHz above the (suppressed) carrier freq
    block = cfg.resampler_plan.block_in
    t = np.arange(block * 6) / channel_rate
    x = (0.3 * np.exp(1j * 2 * np.pi * 1000.0 * t)).astype(np.complex64)
    audio = _run_blocks(demod_ssb.process, demod_ssb.make_state(cfg), x, cfg, 6, block)
    audio = audio[len(audio) // 3 :]
    snr = _tone_snr(audio, 1000.0, cfg.audio_rate)
    assert snr > 30.0, f"SSB SNR {snr:.1f} dB"


def test_ssb_rejects_opposite_sideband():
    channel_rate = 48000.0
    cfg = demod_ssb.SSBConfig(
        channel_rate=channel_rate, usb=True, bandwidth=3000.0, low_cutoff=300.0,
        agc_enable=False,
    )
    block = cfg.resampler_plan.block_in
    t = np.arange(block * 4) / channel_rate
    x = (0.3 * np.exp(-1j * 2 * np.pi * 1000.0 * t)).astype(np.complex64)  # LSB tone
    audio = _run_blocks(demod_ssb.process, demod_ssb.make_state(cfg), x, cfg, 4, block)
    assert np.abs(audio[len(audio) // 2 :]).max() < 0.02


def test_wfm_end_to_end():
    channel_rate = 192000.0
    cfg = demod_wfm.WFMConfig(
        channel_rate=channel_rate, fm_deviation=75000.0, rf_bandwidth=180000.0,
        squelch_db=-70.0,
    )
    src = testsource.TestSourceConfig(
        sample_rate=channel_rate, modulation="fm", tone_freq=1000.0,
        fm_deviation=75000.0, amplitude=0.5,
    )
    block = cfg.resampler_plan.block_in
    x = testsource.generate(src, block * 4)
    audio = _run_blocks(demod_wfm.process, demod_wfm.make_state(cfg), x, cfg, 4, block)
    audio = audio[len(audio) // 3 :]
    snr = _tone_snr(audio, 1000.0, cfg.audio_rate)
    assert snr > 30.0, f"WFM SNR {snr:.1f} dB"


def test_nfm_vmapped_bank():
    """Channel-parallelism: 4 NFM channels demodulated as one vmapped bank."""
    channel_rate = 96000.0
    cfg = demod_nfm.NFMConfig(channel_rate=channel_rate, squelch_db=-60.0)
    block = cfg.resampler_plan.block_in
    src = testsource.TestSourceConfig(
        sample_rate=channel_rate, modulation="fm", tone_freq=1000.0,
        fm_deviation=5000.0, amplitude=0.5,
    )
    x1 = testsource.generate(src, block * 5)
    x = np.stack([x1, x1, x1, x1])
    state = demod_nfm.make_state(cfg, batch_shape=(4,))
    run = jax.jit(demod_nfm.process, static_argnums=2)
    outs = []
    for b in range(5):
        state, audio = run(state, jnp.asarray(x[:, b * block : (b + 1) * block]), cfg)
        outs.append(np.asarray(audio))
    audio = np.concatenate(outs, axis=-1)
    assert audio.shape[0] == 4
    for c in range(4):
        a = audio[c][audio.shape[1] // 2 :]  # skip squelch-attack transient
        assert _tone_snr(a, 1000.0, cfg.audio_rate) > 26.0  # see test_nfm_end_to_end


@pytest.mark.parametrize("mod", ["am", "ssb", "wfm"])
def test_vmapped_banks_other_demods(mod):
    """Channel-parallelism holds for every P0 demod, not just NFM."""
    if mod == "am":
        cfg = demod_am.AMConfig(channel_rate=48000.0, squelch_db=-60.0)
        make, proc = demod_am.make_state, demod_am.process
        src = testsource.TestSourceConfig(sample_rate=48000.0, modulation="am",
                                          tone_freq=1000.0, am_depth=0.8, amplitude=0.5)
    elif mod == "ssb":
        cfg = demod_ssb.SSBConfig(channel_rate=48000.0, agc_enable=False)
        make, proc = demod_ssb.make_state, demod_ssb.process
        src = None
    else:
        cfg = demod_wfm.WFMConfig(channel_rate=192000.0, squelch_db=-70.0)
        make, proc = demod_wfm.make_state, demod_wfm.process
        src = testsource.TestSourceConfig(sample_rate=192000.0, modulation="fm",
                                          tone_freq=1000.0, fm_deviation=75000.0,
                                          amplitude=0.5)
    block = cfg.resampler_plan.block_in
    n_blocks = 5
    if src is None:
        t = np.arange(block * n_blocks) / cfg.channel_rate
        x1 = (0.3 * np.exp(1j * 2 * np.pi * 1000.0 * t)).astype(np.complex64)
    else:
        x1 = testsource.generate(src, block * n_blocks)
    x = np.stack([x1] * 3)
    state = make(cfg, batch_shape=(3,))
    run = jax.jit(proc, static_argnums=2)
    outs = []
    for b in range(n_blocks):
        state, audio = run(state, jnp.asarray(x[:, b * block : (b + 1) * block]), cfg)
        outs.append(np.asarray(audio))
    audio = np.concatenate(outs, axis=-1)
    for c in range(3):
        a = audio[c][audio.shape[-1] // 2 :]
        assert _tone_snr(a, 1000.0, 48000.0) > 20.0, (mod, c)


def test_am_synchronous_mode():
    """PLL-synchronous AM (amdemod processOneSample PLL branch): carrier
    with a small frequency error is tracked and the tone recovered."""
    channel_rate = 48000.0
    cfg = demod_am.AMConfig(
        channel_rate=channel_rate, squelch_db=-60.0, sync_am=True, sync_usb=True,
    )
    block = cfg.resampler_plan.block_in
    n = block * 6
    t = np.arange(n) / channel_rate
    env = 1.0 + 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    # 30 Hz carrier error that plain envelope detection tolerates but the
    # PLL must track for coherent detection
    x = (0.4 * env * np.exp(1j * 2 * np.pi * 30.0 * t)).astype(np.complex64)
    audio = _run_blocks(demod_am.process, demod_am.make_state(cfg), x, cfg, 6, block)
    a = audio[len(audio) // 2 :]
    snr = _tone_snr(a, 1000.0, cfg.audio_rate)
    assert snr > 15.0, f"sync-AM SNR {snr:.1f} dB"
