"""ATV demod test: synthesize an AM video signal with sync pulses and a
pattern; verify line slicing and pattern recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# Frame assembly: interleave + HSkip semantics (VERDICT r2 #8;
# atvdemod.h:446-541 processClassic/processHSkip)
# ---------------------------------------------------------------------------

def _synth_standard(cfg, n_frames, row_level):
    """Synthetic baseband video per the standard's field structure: hsync
    tip + black porch + per-row content level; interleaved standards send
    two fields (even rows then odd rows) with the second field's vsync
    broad pulses starting mid-line."""
    std = cfg.std
    spl = cfg.samples_per_line
    vis = cfg.visible_lines
    hs = max(2, int(0.073 * spl))

    def make_line(content, broad=False, half=False):
        # every line carries a white reference at its tail so the demod's
        # per-block envelope normalization is constant across blocks
        line = np.full(spl, 0.35, np.float32)
        if broad:
            line[:] = 0.4
            if half:  # second field: broad pulses start mid-line
                line[spl // 2:] = 0.0
                line[: int(0.2 * spl)] = 0.0
            else:
                line[: int(0.7 * spl)] = 0.0
            line[spl // 2 - 6: spl // 2] = 1.0
            return line
        line[:hs] = 0.0
        line[hs:] = content
        line[-6:] = 1.0
        return line

    lines = []
    if cfg.standard == "hskip":
        for f in range(n_frames):
            # skipped hsync marks the frame boundary
            nos = np.full(spl, 0.5, np.float32)
            nos[-6:] = 1.0
            lines.append(nos)
            for r in range(std.lines - 1):
                lines.append(make_line(row_level(f, r)))
    elif std.interleaved:
        n_black = std.black_lines // 2
        for f in range(n_frames):
            for half, rows in ((False, range(0, vis, 2)), (True, range(1, vis, 2))):
                for _ in range(n_black):
                    lines.append(make_line(0.0, broad=True, half=half))
                for r in rows:
                    lines.append(make_line(row_level(f, r)))
    else:
        for f in range(n_frames):
            for _ in range(std.black_lines):
                lines.append(make_line(0.0, broad=True))
            for r in range(vis):
                lines.append(make_line(row_level(f, r)))
    return np.concatenate(lines)


@pytest.mark.parametrize("standard,lines_override", [
    ("shortinterleaved", 0), ("short", 0), ("hskip", 0), ("405", 91),
])
def test_atv_frame_assembly_per_standard(standard, lines_override):
    """Line-count + row-order recovery on synthetic interleaved frames.
    405 runs with a reduced line count (geometry scales per config) to keep
    the test fast; its interleave structure is the same as PAL."""
    from sdrangel_tpu.channels import atvframe, demod_atv

    line_rate = 15625.0
    kw = dict(standard=standard)
    if lines_override:
        kw.update(lines=lines_override, fps=line_rate / lines_override)
    cfg = demod_atv.ATVConfig(
        channel_rate=line_rate * 64, modulation="am", **kw)
    std = cfg.std
    vis = cfg.visible_lines

    def row_level(f, r):
        return 0.3 + 0.6 * (r / max(vis - 1, 1))

    video = _synth_standard(cfg, 4, row_level)
    # AM: carrier amplitude = video level (plus headroom offset)
    n = np.arange(len(video))
    iq = (0.1 + 0.85 * video) * np.exp(2j * np.pi * 0.11 * n)
    iq = iq.astype(np.complex64)

    block = cfg.samples_per_line * 32
    st = demod_atv.make_state(cfg)
    asm = atvframe.FrameAssembler(cfg)
    frames = []
    import jax.numpy as jnp

    for b in range(len(iq) // block):
        st, outs = demod_atv.process(st, jnp.asarray(iq[b * block:(b + 1) * block]), cfg)
        frames += asm.feed(np.asarray(outs.lines))

    assert asm.frames >= 2, f"{standard}: only {asm.frames} frames"
    frame = frames[-1]
    if standard == "hskip":
        assert frame.shape[0] == std.lines - 1, frame.shape
        return
    expected = vis if std.interleaved else vis
    assert abs(frame.shape[0] - (expected // 2 * 2 if std.interleaved else expected)) <= 1, (
        standard, frame.shape, expected)
    if std.interleaved:
        assert asm.field_order_detected
    # row order: content level increases monotonically with the row index
    hs = max(2, int(0.073 * cfg.samples_per_line))
    levels = frame[:, hs + 4:-10].mean(axis=1)
    diffs = np.diff(levels)
    frac_up = float(np.mean(diffs > -0.01))
    assert frac_up > 0.9, (
        f"{standard}: rows out of order (weave broken), "
        f"monotonic fraction {frac_up:.2f}")
