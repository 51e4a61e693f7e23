"""ATV demod test: synthesize an AM video signal with sync pulses and a
pattern; verify line slicing and pattern recovery."""

import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.channels import demod_atv


def _make_video_signal(cfg, n_lines_total, pattern):
    """Video level per sample: sync tip (0.0) for 8% of the line, then the
    pattern (0.3..1.0)."""
    spl = cfg.samples_per_line
    sync_len = int(spl * 0.08)
    line = np.empty(spl)
    line[:sync_len] = 0.0
    body = 0.3 + 0.7 * pattern(np.linspace(0, 1, spl - sync_len))
    line[sync_len:] = body
    video = np.tile(line, n_lines_total)
    return video


def test_atv_am_line_recovery():
    cfg = demod_atv.ATVConfig(
        channel_rate=1_000_000.0, lines=100, fps=25.0, modulation="am",
    )
    spl = cfg.samples_per_line  # 400
    pattern = lambda u: 0.5 + 0.5 * np.sin(2 * np.pi * 3 * u)
    video = _make_video_signal(cfg, 300, pattern)
    # AM modulate: envelope = video level (plus small carrier floor)
    iq = (video * np.exp(1j * 0.0)).astype(np.complex64)

    st = demod_atv.make_state(cfg)
    # phase offset: start mid-line to force sync alignment to do work
    start = spl // 3
    block = (len(video) - start) // spl * spl
    st, outs = demod_atv.process(st, jnp.asarray(iq[start : start + block]), cfg)
    st, outs = demod_atv.process(st, jnp.asarray(iq[start : start + block]), cfg)
    lines = np.asarray(outs.lines)
    assert lines.shape[1] == spl
    assert float(outs.sync_quality) > 0.05
    # after sync alignment, column 0..sync_len is the sync tip (dark)
    sync_len = int(spl * 0.08)
    mid = lines[lines.shape[0] // 2]
    assert mid[: sync_len // 2].mean() < 0.2
    # the 3-cycle pattern is present in the line body
    body = mid[sync_len:]
    spec = np.abs(np.fft.rfft(body - body.mean()))
    assert spec.argmax() == 3


def test_atv_mod_demod_loopback():
    """ATV modulator (modatv role) -> ATV demod recovers the test pattern:
    sync alignment locks and the per-line luma gradient survives."""
    import jax

    from sdrangel_tpu.channels import demod_atv, modulators

    rate = 1_250_000.0  # 625 lines * 25 fps * 80 samples/line
    mcfg = modulators.ATVModConfig(channel_rate=rate, modulation="am")
    spl = mcfg.samples_per_line
    assert spl == 80
    n_lines = 256
    # test pattern: horizontal luma ramp, identical on every line
    ramp = np.tile(np.linspace(0.0, 1.0, 64, dtype=np.float32), (n_lines, 1))
    comp = modulators.atv_composite(mcfg, jnp.asarray(ramp))
    mstate = modulators.make_atv_state(mcfg)
    mstate, x = jax.jit(
        lambda s, v: modulators.atv_modulate(s, v, mcfg)
    )(mstate, comp)

    dcfg = demod_atv.ATVConfig(
        channel_rate=rate, modulation="am", lines=625, fps=25.0,
    )
    dstate = demod_atv.make_state(dcfg)
    dstate, outs = jax.jit(
        lambda s, xx: demod_atv.process(s, xx, dcfg), 
    )(dstate, x)
    lines = np.asarray(outs.lines)
    assert float(outs.sync_quality) > 0.3  # clear sync notch
    # sync tip is rolled to column 0: head of each line is the minimum
    mid = lines[50:200]
    assert mid[:, :4].mean() < mid[:, 20:].mean() - 0.2
    # luma ramp: active region increases monotonically on average
    active = mid[:, 12:78].mean(axis=0)
    assert active[-8:].mean() > active[:8].mean() + 0.3
    rho = np.corrcoef(np.arange(active.size), active)[0, 1]
    assert rho > 0.95, rho


def test_atv_standards_geometry():
    """ATVStd* table parity (atvdemod.cpp applyStandard, :681-727): line
    rates, points per line, sync/black line geometry per standard."""
    # PAL625 at 64 us/line: 15625 Hz line rate
    pal = demod_atv.ATVConfig(channel_rate=10_000_000.0, standard="pal625")
    assert pal.line_rate == 625 * 25.0 == 15625.0
    assert pal.samples_per_line == round(10_000_000.0 / 15625.0) == 640
    assert pal.std.sync_lines == 44 and pal.std.black_lines == 48
    assert pal.visible_lines == 625 - 48 and pal.std.interleaved

    # PAL525 (PAL-M): 30 fps
    m = demod_atv.ATVConfig(channel_rate=10_000_000.0, standard="pal525")
    assert m.line_rate == 525 * 30.0 == 15750.0
    assert m.std.sync_lines == 40 and m.std.black_lines == 44

    # 405-line standard
    brit = demod_atv.ATVConfig(channel_rate=4_000_000.0, standard="405")
    assert brit.line_rate == 405 * 25.0
    assert brit.std.eq_lines == 3 and brit.std.interleaved

    # narrowband short/interleaved and HSkip
    si = demod_atv.ATVConfig(channel_rate=500_000.0,
                             standard="shortinterleaved")
    assert si.std.sync_lines == 4 and si.std.interleaved
    sh = demod_atv.ATVConfig(channel_rate=500_000.0, standard="short")
    assert not sh.std.interleaved
    hs = demod_atv.ATVConfig(channel_rate=500_000.0, standard="hskip")
    assert hs.std.sync_lines == 0 and hs.std.black_lines == 0
    assert hs.visible_lines == hs.n_lines  # every line carries image

    # explicit lines/fps override the standard's defaults
    custom = demod_atv.ATVConfig(channel_rate=1_000_000.0,
                                 standard="hskip", lines=100, fps=20.0)
    assert custom.line_rate == 2000.0
    assert custom.samples_per_line == 500

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown ATV standard"):
        _ = demod_atv.ATVConfig(channel_rate=1e6, standard="ntsc!").std


def test_atv_hskip_demod_runs():
    """HSkip: line-sync demod with zero sync/black lines still locks on the
    per-line sync tip."""
    cfg = demod_atv.ATVConfig(
        channel_rate=1_000_000.0, standard="hskip", lines=100, fps=25.0,
        modulation="am",
    )
    spl = cfg.samples_per_line
    pattern = lambda u: u  # luma ramp
    video = _make_video_signal(cfg, 200, pattern)
    iq = video.astype(np.complex64)
    st = demod_atv.make_state(cfg)
    block = (len(video)) // spl * spl
    st, outs = demod_atv.process(st, jnp.asarray(iq[:block]), cfg)
    lines = np.asarray(outs.lines)
    assert lines.shape == (block // spl, spl)
    sync_len = int(spl * 0.08)
    mid = lines[lines.shape[0] // 2]
    assert mid[: sync_len // 2].mean() < 0.2  # sync tip at column 0
    body = mid[sync_len:]
    assert body[-len(body) // 4:].mean() > body[: len(body) // 4].mean()


def test_atv_vestigial_sideband_spectrum_and_loopback():
    """Vestigial-USB ATV (ATVModulationVestigialUSB, atvmod.cpp
    modulateVestigialSSB): the lower sideband is suppressed beyond the
    vestige while envelope detection still recovers the test pattern."""
    import jax

    from sdrangel_tpu.channels import demod_atv, modulators

    rate = 1_250_000.0
    mcfg = modulators.ATVModConfig(
        channel_rate=rate, modulation="vusb",
        rf_bandwidth=400_000.0, rf_opp_bandwidth=60_000.0, fft_len=1024,
    )
    n_lines = 256
    ramp = np.tile(np.linspace(0.0, 1.0, 64, dtype=np.float32), (n_lines, 1))
    comp = modulators.atv_composite(mcfg, jnp.asarray(ramp))
    mstate = modulators.make_atv_state(mcfg)
    mstate, x = jax.jit(
        lambda s, v: modulators.atv_modulate(s, v, mcfg)
    )(mstate, comp)
    x = np.asarray(x)

    spec = np.abs(np.fft.fft(x[2048:])) ** 2  # skip the filter warmup
    freqs = np.fft.fftfreq(len(spec), 1.0 / rate)
    kept = spec[(freqs > 100e3) & (freqs < 350e3)].mean()
    vestige = spec[(freqs > -50e3) & (freqs < -10e3)].mean()
    suppressed = spec[(freqs < -150e3) & (freqs > -350e3)].mean()
    assert kept > 100 * suppressed, (kept, suppressed)
    assert vestige > 10 * suppressed, (vestige, suppressed)

    # plain USB for contrast: even the vestige region is suppressed
    ucfg = modulators.ATVModConfig(
        channel_rate=rate, modulation="usb",
        rf_bandwidth=400_000.0, fft_len=1024,
    )
    ustate = modulators.make_atv_state(ucfg)
    _, xu = jax.jit(
        lambda s, v: modulators.atv_modulate(s, v, ucfg)
    )(ustate, comp)
    specu = np.abs(np.fft.fft(np.asarray(xu)[2048:])) ** 2
    vest_u = specu[(freqs > -50e3) & (freqs < -10e3)].mean()
    kept_u = specu[(freqs > 100e3) & (freqs < 350e3)].mean()
    assert kept_u > 100 * vest_u, (kept_u, vest_u)

    # envelope loopback: the luma ramp survives vestigial filtering
    dcfg = demod_atv.ATVConfig(
        channel_rate=rate, modulation="am", lines=625, fps=25.0,
    )
    dstate = demod_atv.make_state(dcfg)
    dstate, outs = jax.jit(
        lambda s, xx: demod_atv.process(s, xx, dcfg),
    )(dstate, jnp.asarray(x))
    lines = np.asarray(outs.lines)
    assert float(outs.sync_quality) > 0.25  # sync survives VSB filtering
    mid = lines[50:200]
    active = mid[:, 12:78].mean(axis=0)
    # envelope detection of VSB carries quadrature distortion (the vestige
    # is only 60 kHz of a 400 kHz video band), so the ramp is noisier than
    # the AM case — require a clear but not pristine correlation
    rho = np.corrcoef(np.arange(active.size), active)[0, 1]
    assert rho > 0.6, rho
