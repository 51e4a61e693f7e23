"""Tests: UDP egress/ingest, scope ops, channel analyzer, LoRa demod."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.channels import chanalyzer, demod_lora
from sdrangel_tpu.dsp import scope
from sdrangel_tpu.dsp.types import np_tone
from sdrangel_tpu.io import udp


# --- UDP -------------------------------------------------------------------

def test_udp_roundtrip_formats():
    for fmt in udp.FORMATS:
        src = udp.UdpSource("127.0.0.1", 0, fmt=fmt, timeout=5.0)
        sink = udp.UdpSink("127.0.0.1", src.port, fmt=fmt, payload_bytes=256)
        if fmt.startswith("iq"):
            data = (np.exp(1j * np.linspace(0, 6, 500)) * 0.5).astype(np.complex64)
        elif fmt == "stereo16":
            data = np.random.default_rng(0).uniform(-0.5, 0.5, (500, 2)).astype(np.float32)
        else:
            data = np.random.default_rng(0).uniform(-0.5, 0.5, 500).astype(np.float32)
        got = {}

        def reader():
            got["d"] = src.read(500)

        t = threading.Thread(target=reader)
        t.start()
        sink.write(data)
        sink.flush()
        t.join(timeout=5)
        assert "d" in got
        atol = 1e-4 if fmt != "iq24" else 1e-6
        if fmt == "float32":
            atol = 1e-7
        np.testing.assert_allclose(got["d"], data, atol=atol)
        sink.close()
        src.close()


# --- scope -----------------------------------------------------------------

def test_projections():
    x = jnp.asarray(np_tone(0.1, 1.0, 256, amp=2.0))
    assert np.allclose(np.asarray(scope.project(x, scope.Projection.MAG_LIN)), 2.0, atol=1e-5)
    db = np.asarray(scope.project(x, scope.Projection.MAG_DB))
    assert np.allclose(db, 20.0 * np.log10(2.0), atol=1e-3)
    dp = np.asarray(scope.project(x, scope.Projection.DPHASE))
    assert np.allclose(dp[1:], 0.2, atol=1e-3)  # 2*f/fs


def test_trigger_positive_edge():
    t = np.zeros(512, np.complex64)
    t[200:] = 1.0
    idx = scope.find_trigger(jnp.asarray(t), scope.TriggerCondition(
        projection=scope.Projection.REAL, level=0.5))
    assert int(idx) == 200
    idx2, trace = scope.capture(jnp.asarray(t), scope.TriggerCondition(
        projection=scope.Projection.REAL, level=0.5), length=64, pre=8)
    assert int(idx2) == 200
    tr = np.asarray(trace)
    assert tr[7].real == 0.0 and tr[9].real == 1.0


def test_trigger_none():
    x = jnp.zeros(128, jnp.complex64)
    idx = scope.find_trigger(x, scope.TriggerCondition(level=0.5))
    assert int(idx) == -1


# --- channel analyzer ------------------------------------------------------

def test_chanalyzer_spectrum_and_power():
    fs = 48000.0
    cfg = chanalyzer.ChanAnalyzerConfig(channel_rate=fs, bandwidth=10000.0)
    st = chanalyzer.make_state(cfg)
    x = np_tone(5000.0, fs, 8192, amp=0.5)
    st, outs = chanalyzer.process(st, jnp.asarray(x), cfg)
    spec = np.asarray(outs.spectrum)
    peak_bin = spec.argmax()
    expect = 512 + int(5000.0 / fs * 1024)
    assert abs(peak_bin - expect) <= 2
    assert -8.0 < float(outs.channel_power_db) < -5.0  # |0.5|^2 = -6 dB


def test_chanalyzer_ssb_rejects():
    fs = 48000.0
    cfg = chanalyzer.ChanAnalyzerConfig(
        channel_rate=fs, bandwidth=3000.0, low_cutoff=300.0, ssb=True, usb=True
    )
    st = chanalyzer.make_state(cfg)
    x = np_tone(-1000.0, fs, 8192, amp=0.5)  # LSB tone, USB analyzer
    st, outs = chanalyzer.process(st, jnp.asarray(x), cfg)
    iq = np.asarray(jnp.stack([jnp.real(outs.iq), jnp.imag(outs.iq)]))
    assert np.abs(iq[0] + 1j * iq[1])[2048:].mean() < 0.01


# --- LoRa ------------------------------------------------------------------

def test_lora_symbol_recovery():
    cfg = demod_lora.LoRaConfig(channel_rate=500000.0, bandwidth=125000.0, spread_factor=7)
    rng = np.random.default_rng(9)
    n_frames_needed = cfg.resamp_plan.block_out // cfg.n_bins
    symbols = rng.integers(0, cfg.n_bins, size=n_frames_needed * 2)
    chips = demod_lora.make_symbol_chirps(symbols, cfg)
    # upsample chips to channel rate (zero-order hold 4x)
    x = np.repeat(chips, 4).astype(np.complex64) * 0.5
    st = demod_lora.make_state(cfg)
    got = []
    block = cfg.resamp_plan.block_in
    for b in range(len(x) // block):
        st, outs = demod_lora.process(st, jnp.asarray(x[b * block : (b + 1) * block]), cfg)
        got.append(np.asarray(outs.symbols))
    got = np.concatenate(got)
    # The resampler group delay rotates every detected bin by a constant
    # (a real receiver estimates it from the preamble); estimate the modal
    # offset then require consistent recovery.
    offs = [(int(g) - int(s)) % cfg.n_bins for g, s in zip(got[1:], symbols[1:])]
    modal = max(set(offs), key=offs.count)
    matches = sum(1 for o in offs if o == modal)
    assert matches >= len(offs) * 0.9, (got[:16], symbols[:16], modal)
