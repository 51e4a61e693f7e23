"""Broadcast FM tests: stereo separation and RDS decode from a synthesized
multiplex — end-to-end through the BFM channel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.channels import demod_bfm, rds


def _tone_snr(audio, tone_hz, fs):
    n = len(audio)
    audio = audio - audio.mean()
    spec = np.abs(np.fft.rfft(audio * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    tone_bins = np.abs(freqs - tone_hz) < 4.0 * fs / n
    return 10.0 * np.log10(spec[tone_bins].sum() / max(spec[~tone_bins].sum(), 1e-30))


def _make_mpx(fs, n, left, right, rds_wave=None):
    """Standard FM stereo multiplex: (L+R)/2 + pilot + (L-R)/2 @38k
    (+RDS @57k), with the BROADCAST phase convention (ITU-R BS.450):
    subcarrier sin(2θ) locked to pilot sin(θ). (A cos/cos fixture here
    once masked a convention bug the bfm384 reference golden caught.)"""
    t = np.arange(n) / fs
    pilot_phase = 2 * np.pi * 19000.0 * t
    mono = 0.5 * (left + right)
    diff = 0.5 * (left - right)
    mpx = 0.45 * mono + 0.09 * np.sin(pilot_phase) + 0.45 * diff * np.sin(2 * pilot_phase)
    if rds_wave is not None:
        mpx = mpx + 0.06 * rds_wave * np.sin(3 * pilot_phase)
    return mpx


def _fm_modulate(mpx, fs, deviation=75000.0):
    phase = 2 * np.pi * deviation * np.cumsum(mpx) / fs
    return (0.5 * np.exp(1j * phase)).astype(np.complex64)


def _run_bfm(cfg, x, n_blocks, block):
    state = demod_bfm.make_state(cfg)
    run = jax.jit(demod_bfm.process, static_argnums=2)
    audio, rds_bb, pilots = [], [], []
    for b in range(n_blocks):
        state, outs = run(state, jnp.asarray(x[b * block : (b + 1) * block]), cfg)
        audio.append(np.asarray(outs.audio))
        rds_bb.append(np.asarray(jnp.stack([jnp.real(outs.rds_baseband), jnp.imag(outs.rds_baseband)])))
        pilots.append(float(outs.pilot_level))
    a = np.concatenate(audio, axis=0)
    r = np.concatenate([rb[0] + 1j * rb[1] for rb in rds_bb], axis=-1)
    return a, r, pilots


def test_stereo_separation():
    """Left-only content must come out almost exclusively on the left."""
    fs = 384000.0
    cfg = demod_bfm.BFMConfig(channel_rate=fs, squelch_db=-100.0, rds_active=False)
    block = cfg.mono_plan.block_in
    n = block * 6
    t = np.arange(n) / fs
    left = 0.9 * np.sin(2 * np.pi * 1000.0 * t)
    right = np.zeros(n)
    x = _fm_modulate(_make_mpx(fs, n, left, right), fs)
    audio, _, pilots = _run_bfm(cfg, x, 6, block)
    a = audio[len(audio) // 2 :]
    snr_l = _tone_snr(a[:, 0], 1000.0, 48000.0)
    snr_r = _tone_snr(a[:, 1], 1000.0, 48000.0)
    assert pilots[-1] > 0.02, "pilot not detected"
    assert snr_l > 20.0, f"left SNR {snr_l:.1f}"
    # separation: left power >> right power at the tone
    pl = a[:, 0].var()
    pr = a[:, 1].var()
    assert pl / max(pr, 1e-12) > 20.0, f"separation {10*np.log10(pl/pr):.1f} dB"


def test_mono_fallback():
    fs = 384000.0
    cfg = demod_bfm.BFMConfig(channel_rate=fs, audio_stereo=False, squelch_db=-100.0)
    block = cfg.mono_plan.block_in
    n = block * 4
    t = np.arange(n) / fs
    tone = 0.9 * np.sin(2 * np.pi * 1000.0 * t)
    x = _fm_modulate(_make_mpx(fs, n, tone, tone), fs)
    audio, _, _ = _run_bfm(cfg, x, 4, block)
    a = audio[len(audio) // 2 :]
    assert _tone_snr(a[:, 0], 1000.0, 48000.0) > 20.0
    np.testing.assert_allclose(a[:, 0], a[:, 1], atol=1e-6)  # identical channels


def test_rds_codec_roundtrip():
    """Block-layer sanity: encode groups -> waveform -> decode."""
    groups = [
        [0x1234, (0 << 12) | (1 << 10) | (5 << 5) | 0, 0xE0CD, ord("A") << 8 | ord("B")],
        [0x1234, (0 << 12) | (1 << 10) | (5 << 5) | 1, 0xE0CD, ord("C") << 8 | ord("D")],
        [0x1234, (0 << 12) | (1 << 10) | (5 << 5) | 2, 0xE0CD, ord("E") << 8 | ord("F")],
        [0x1234, (0 << 12) | (1 << 10) | (5 << 5) | 3, 0xE0CD, ord("G") << 8 | ord("H")],
    ]
    bits = np.concatenate([rds.encode_group(g) for g in groups] * 3)
    wave = rds.bits_to_waveform(bits, sps=8)
    dec = rds.RDSDecoder(sps=8)
    out = dec.feed_baseband(wave.astype(np.complex64))
    assert dec.status.groups_ok >= 8, dec.status
    assert dec.status.pi == 0x1234
    assert dec.status.pty == 5
    assert dec.status.tp is True
    assert dec.status.ps_name == "ABCDEFGH"
    assert dec.status.pty_name == "Education"


@pytest.mark.slow
def test_rds_through_bfm_channel():
    """Full chain: RDS bits -> 57 kHz subcarrier in the MPX -> FM -> BFM
    channel -> RDS baseband -> decoder recovers PI and PS name."""
    fs = 384000.0
    cfg = demod_bfm.BFMConfig(channel_rate=fs, squelch_db=-100.0, rds_active=True)
    block = cfg.mono_plan.block_in

    groups = [
        [0xF123, (0 << 12) | (2 << 5) | seg, 0x0000,
         (ord("T") + seg) << 8 | (ord("U") + seg)]
        for seg in range(4)
    ]
    bits = np.concatenate([rds.encode_group(g) for g in groups] * 40)
    sym_rate = rds.RDS_SYMBOL_RATE if hasattr(rds, "RDS_SYMBOL_RATE") else 1187.5
    wave8 = rds.bits_to_waveform(bits, sps=8)  # at 9500 Hz
    # upsample the biphase waveform to fs (zero-order hold is fine: spectrum
    # is confined well inside ±2.4 kHz after the channel's lowpass)
    reps = int(round(fs / 9500.0 * 1000))
    idx = (np.arange(int(len(wave8) * fs / 9500.0)) * 9500.0 / fs).astype(np.int64)
    idx = idx[idx < len(wave8)]
    rds_fs = wave8[idx]
    n = (len(rds_fs) // block) * block
    n_blocks = min(n // block, 160)  # ≈2.5 s ≈ 29 groups of signal
    n = n_blocks * block
    t = np.arange(n) / fs
    tone = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    mpx = _make_mpx(fs, n, tone, tone, rds_wave=rds_fs[:n])
    x = _fm_modulate(mpx, fs)

    state = demod_bfm.make_state(cfg)
    run = jax.jit(demod_bfm.process, static_argnums=2)
    dec = rds.RDSDecoder(sps=8)
    for b in range(n_blocks):
        state, outs = run(state, jnp.asarray(x[b * block : (b + 1) * block]), cfg)
        rb = np.asarray(jnp.stack([jnp.real(outs.rds_baseband), jnp.imag(outs.rds_baseband)]))
        dec.feed_baseband(rb[0] + 1j * rb[1])
    assert dec.status.groups_ok >= 4, vars(dec.status)
    assert dec.status.pi == 0xF123
    assert "TU" in dec.status.ps_name or dec.status.ps_name.strip(), dec.status.ps_name


def test_rds_clock_time_group():
    """Group 4A decodes MJD + time (rdsparser.cpp decode_type4 role)."""
    # 2026-08-17 = MJD 61269; 14:30 UTC+2 (4 half-hours)
    mjd, hour, minute = 61269, 14, 30
    g1 = (4 << 12) | ((mjd >> 15) & 0x3)
    g2 = ((mjd & 0x7FFF) << 1) | (hour >> 4)
    g3 = ((hour & 0xF) << 12) | (minute << 6) | 4
    dec = rds.RDSDecoder()
    dec.parse_group([0x1234, g1, g2, g3])
    assert dec.status.clock_time == "2026-08-17 14:30+2h", dec.status.clock_time


def test_rds_single_bit_correction():
    """A flipped bit inside a block is corrected, not dropped."""
    groups = [[0x5678, (0 << 12) | (3 << 5) | s, 0x0000, 0x4150 + s] for s in range(4)] * 4
    bits = np.concatenate([rds.encode_group(g) for g in groups])
    # flip one bit inside the 5th group's B block
    flip = 4 * 104 + 26 + 11
    bits = bits.copy()
    bits[flip] ^= 1
    dec = rds.RDSDecoder()
    for b in bits:
        g = dec._feed_bit(int(b))
        if g:
            dec.parse_group(g)
    assert dec.status.blocks_corrected >= 1
    assert dec.status.groups_ok >= len(groups) - 1
    assert dec.status.pi == 0x5678


def test_rds_burst_correction():
    """The (26,16) code's designed burst-5 correction: a 5-bit burst inside
    one block is repaired (reference only detects; rdsdecoder.cpp)."""
    groups = [[0x5678, (0 << 12) | (3 << 5) | s, 0xE0CD, 0x4150 + s] for s in range(4)] * 4
    bits = np.concatenate([rds.encode_group(g) for g in groups]).copy()
    start = 4 * 104 + 2 * 26 + 7  # inside the 5th group's C block
    for off in (0, 1, 3, 4):  # span-5 burst: bits 0 and 4 set
        bits[start + off] ^= 1
    dec = rds.RDSDecoder()
    for b in bits:
        g = dec._feed_bit(int(b))
        if g:
            dec.parse_group(g)
    assert dec.status.blocks_corrected >= 1
    assert dec.status.groups_ok >= len(groups) - 1


def test_rds_af_list():
    """0A block-C AF pairs accumulate into a VHF alternate-frequency list."""
    dec = rds.RDSDecoder()
    # AF codes: 224+2 = "2 AFs follow"; 15 -> 89.0 MHz; 100 -> 97.5 MHz
    dec.parse_group([0x1234, (0 << 12) | 0, (226 << 8) | 15, 0x2020])
    dec.parse_group([0x1234, (0 << 12) | 1, (100 << 8) | 205, 0x2020])
    assert dec.status.af_mhz == [89.0, 97.5], dec.status.af_mhz
    # LF/MF escape: 250 then code 1 -> 153 kHz
    dec.parse_group([0x1234, (0 << 12) | 2, (250 << 8) | 1, 0x2020])
    assert dec.status.af_khz == [153.0]


def test_rds_flags_pin_ptyn_oda_eon_tmc():
    dec = rds.RDSDecoder()
    # group 0A with TA=1, M/S=1
    dec.parse_group([0x1234, (0 << 12) | (1 << 4) | (1 << 3), 0xCDCD, 0x2020])
    assert dec.status.ta is True and dec.status.music is True
    # 1A: PIN
    dec.parse_group([0x1234, (1 << 12), 0, (17 << 11) | (14 << 6) | 30])
    assert dec.status.pin == (17 << 11) | (14 << 6) | 30
    # 3A: ODA announcing TMC (AID 0xCD46) on group 8A
    dec.parse_group([0x1234, (3 << 12) | (8 << 1), 0, 0xCD46])
    assert dec.status.oda == {"8A": 0xCD46}
    # 10A: PTYN "ROCK    "
    dec.parse_group([0x1234, (10 << 12) | 0, ord("R") << 8 | ord("O"), ord("C") << 8 | ord("K")])
    dec.parse_group([0x1234, (10 << 12) | 1, 0x2020, 0x2020])
    assert dec.status.ptyn == "ROCK    "
    # 14A: EON PS of other network 0xABCD
    for v, pair in enumerate(["NE", "TW", "OR", "K2"]):
        dec.parse_group([0x1234, (14 << 12) | v, ord(pair[0]) << 8 | ord(pair[1]), 0xABCD])
    assert dec.status.eon[0xABCD]["ps"] == "NETWORK2"
    # 14A variant 4: two AFs (accumulated), variant 5: one mapped freq,
    # variant 9: a mapped AM freq; committed by variant 12 (linkage)
    dec.parse_group([0x1234, (14 << 12) | 4, (10 << 8) | 30, 0xABCD])
    dec.parse_group([0x1234, (14 << 12) | 5, (10 << 8) | 50, 0xABCD])
    dec.parse_group([0x1234, (14 << 12) | 9, (10 << 8) | 20, 0xABCD])
    assert "af_mhz" not in dec.status.eon[0xABCD]  # pending until linkage
    dec.parse_group([0x1234, (14 << 12) | 12, 0x0001, 0xABCD])
    eon = dec.status.eon[0xABCD]
    assert eon["af_mhz"] == [88.5, 90.5]
    assert eon["mapped_mhz"] == [92.5]
    assert eon["mapped_khz"] == [531.0 + 9.0 * 4]
    # variant 13: PTY(ON) + TA(ON); variant 14: PIN(ON)
    dec.parse_group([0x1234, (14 << 12) | 13, (9 << 11) | 1, 0xABCD])
    assert eon["pty"] == 9 and eon["ta"] is True
    dec.parse_group([0x1234, (14 << 12) | 14, 0x5B7E, 0xABCD])
    assert eon["pin"] == 0x5B7E
    # 14B: TA(ON) switch signal (block-2 bit 3) — the reference drops B
    # groups entirely (rdsparser.cpp:1015 `if (!B)`)
    dec.parse_group([0x1234, (14 << 12) | (1 << 11) | (0 << 3), 0x1234, 0xABCD])
    assert dec.status.eon[0xABCD]["ta"] is False
    # 8A: TMC user message, single group: event 201 (accident), extent 2
    b2 = (1 << 15) | (0 << 14) | (2 << 11) | 201
    dec.parse_group([0x1234, (8 << 12) | (1 << 3) | 5, b2, 0xBEEF])
    ev = dec.status.tmc_events[-1]
    assert ev["event"] == 201 and ev["event_text"] == "(Q) accident(s)"
    assert ev["extent"] == 2 and ev["location"] == 0xBEEF and ev["diversion"]
    assert ev["single_group"] and ev["duration"] == 5
    # 15B: fast TA toggle off
    dec.parse_group([0x1234, (15 << 12) | (1 << 11) | (0 << 4) | (0 << 3), 0, 0])
    assert dec.status.ta is False and dec.status.music is False


def test_pilot_pll_vs_analytic_pilot_parity():
    """The scan PLL (dsp/phaselock.py, the reference's PhaseLock path) and
    the analytic-bandpass pilot path used inside demod_bfm produce matched
    38 kHz references: both recover the same L-R subcarrier signal."""
    from sdrangel_tpu.dsp import firdesign, phaselock

    fs = 192000.0
    n = 1 << 16
    t = np.arange(n) / fs
    pilot_phase = 2 * np.pi * 19000.0 * t + 0.7
    lr = np.sin(2 * np.pi * 400.0 * t)  # stereo difference signal
    mpx = (0.09 * np.cos(pilot_phase) + 0.45 * lr * np.cos(2 * pilot_phase)).astype(np.float32)

    # (a) PLL path
    st = phaselock.make_pilot_pll(19000.0, fs)
    run = jax.jit(lambda s, x: phaselock.pilot_pll_run(s, x, 19000.0, fs, 40.0))
    st, _c1, c2, _c3 = run(st, jnp.asarray(mpx))
    lr_pll = np.asarray(mpx * 2.0 * np.asarray(c2)) / 0.45

    # (b) analytic pilot path (complex bandpass -> e^{j2θ}), as in demod_bfm
    ntaps = 501
    lp = firdesign.lowpass(ntaps, 400.0 / fs).astype(np.float64)
    k = np.arange(ntaps) - ntaps // 2
    taps = 2.0 * lp * np.exp(1j * 2 * np.pi * 19000.0 / fs * k)
    z = np.convolve(mpx.astype(np.float64), taps, mode="same")
    unit = z / np.maximum(np.abs(z), 1e-9)
    lr_ana = np.real(mpx * 2.0 * np.real(unit * unit)) / 0.45

    # compare after PLL lock + filter edge, through a common audio lowpass
    af = firdesign.lowpass(301, 15000.0 / fs)
    a = np.convolve(lr_pll, af, mode="same")[40000:60000]
    b = np.convolve(lr_ana, af, mode="same")[40000:60000]
    ref = lr[40000:60000]
    for rec, name in ((a, "pll"), (b, "analytic")):
        err = rec - ref
        snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))
        assert snr > 20.0, (name, snr)
    # and against each other
    xerr = a - b
    xsnr = 10 * np.log10(np.mean(ref**2) / max(np.mean(xerr**2), 1e-30))
    assert xsnr > 20.0, xsnr


def test_rds_radiotext_plus():
    """RT+ (ODA AID 0x4BD7): tags extract artist/title substrings of the
    RadioText once the 3A announcement binds the carrier group."""
    dec = rds.RDSDecoder()
    # RadioText: "Now: Queen - Bohemian Rhapsody" via 2A segments
    rt = "Now: Queen - Bohemian Rhapsody".ljust(64)
    for seg in range(16):
        chars = rt[4 * seg : 4 * seg + 4]
        dec.parse_group([0x1234, (2 << 12) | seg,
                         (ord(chars[0]) << 8) | ord(chars[1]),
                         (ord(chars[2]) << 8) | ord(chars[3])])
    assert dec.status.radiotext.startswith("Now: Queen")
    # 3A: announce RT+ on group 11A
    dec.parse_group([0x1234, (3 << 12) | (11 << 1), 0, rds.AID_RTPLUS])
    assert dec.status.oda["11A"] == rds.AID_RTPLUS
    # 11A RT+: tag1 = artist (ct 4) at "Queen" (start 5, len 4);
    # tag2 = title (ct 1) at "Bohemian Rhapsody" (start 13, len 16)
    ct1, s1, l1 = 4, 5, 4
    ct2, s2, l2 = 1, 13, 16
    b2 = (ct1 >> 3) & 0x7
    b3 = ((ct1 & 0x7) << 13) | (s1 << 7) | (l1 << 1) | (ct2 >> 5)
    b4 = ((ct2 & 0x1F) << 11) | (s2 << 5) | l2
    dec.parse_group([0x1234, (11 << 12) | b2, b3, b4])
    assert dec.status.rtplus["item.artist"] == "Queen"
    assert dec.status.rtplus["item.title"] == "Bohemian Rhapsody"
