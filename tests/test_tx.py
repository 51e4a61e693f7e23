"""Tx slice tests: modulate → upchannelize → interpolate → demodulate back
with the Rx chain (loopback — stronger than the reference's manual checks)."""

import numpy as np
import pytest

from sdrangel_tpu.io import sdriq
from sdrangel_tpu.runtime.engine import ChannelSpec, DeviceConfig, RxPipeline
from sdrangel_tpu.runtime.tx import TxChannelSpec, TxDeviceConfig, TxPipeline


def _tone_snr(audio, tone_hz, fs):
    n = len(audio)
    audio = audio - audio.mean()
    spec = np.abs(np.fft.rfft(audio * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    tone_bins = np.abs(freqs - tone_hz) < 4.0 * fs / n
    return 10.0 * np.log10(spec[tone_bins].sum() / max(spec[~tone_bins].sum(), 1e-30))


def _af_tone(freq=1000.0, fs=48000.0):
    def src(b, c, count):
        t = (b * count + np.arange(count)) / fs
        return np.sin(2 * np.pi * freq * t).astype(np.float32)

    return src


@pytest.mark.parametrize("uri,rx_uri,offset", [
    ("sdrangel.channeltx.modnfm", "sdrangel.channel.nfmdemod", 50_000.0),
    ("sdrangel.channeltx.modam", "sdrangel.channel.amdemod", -40_000.0),
])
def test_tx_rx_loopback(uri, rx_uri, offset):
    """Full duplex loopback: Tx places a modulated channel at `offset` in a
    384 kHz baseband; the Rx pipeline recovers the 1 kHz AF tone."""
    tx_dev = TxDeviceConfig(sample_rate=384_000.0, log2_interp=1)
    tx = TxPipeline(tx_dev, [TxChannelSpec(uri, offset, {})], block_af=4096)

    n_blocks = 24
    parts = [out for out in tx.run(_af_tone(), n_blocks)]
    raw = np.concatenate(parts, axis=0)

    rx_dev = DeviceConfig(sample_rate=384_000.0, log2_decim=1)
    rx = RxPipeline(rx_dev, [ChannelSpec(rx_uri, offset, {"squelch_db": -60.0})])
    n_rx = len(raw) // rx.device_block
    assert n_rx >= 2, (len(raw), rx.device_block)

    audio = np.concatenate([
        outs["channels"][0]["audio"]
        for _, outs in rx.run(lambda b, n: raw[b * n : (b + 1) * n], n_rx)
    ])
    a = audio[len(audio) // 2 :]
    snr = _tone_snr(a, 1000.0, 48000.0)
    assert snr > 20.0, f"{uri} loopback SNR {snr:.1f} dB"


def test_tx_spectrum_placement():
    """The modulated channel actually sits at the requested offset."""
    offset = 96_000.0
    tx_dev = TxDeviceConfig(sample_rate=768_000.0, log2_interp=0)
    tx = TxPipeline(
        tx_dev, [TxChannelSpec("sdrangel.channeltx.modnfm", offset, {})], block_af=4096
    )
    raw = np.concatenate(list(tx.run(_af_tone(), 8)), axis=0)
    x = raw.astype(np.float32) / 32768.0
    c = (x[:, 0] + 1j * x[:, 1])[4096:]
    spec = np.abs(np.fft.fft(c * np.hanning(len(c))))
    freqs = np.fft.fftfreq(len(c), 1.0 / 768_000.0)
    peak_freq = freqs[spec.argmax()]
    assert abs(peak_freq - offset) < 7_000.0, peak_freq


def test_tx_two_channel_merge(tmp_path):
    """Two modulators merged into one baseband (sum/÷k) and recorded to
    .sdriq (the filesink role); both carriers present."""
    tx_dev = TxDeviceConfig(sample_rate=384_000.0, log2_interp=0)
    tx = TxPipeline(
        tx_dev,
        [
            TxChannelSpec("sdrangel.channeltx.modnfm", 60_000.0, {}),
            TxChannelSpec("sdrangel.channeltx.modam", -90_000.0, {}),
        ],
        block_af=4096,
    )
    raw = np.concatenate(list(tx.run(_af_tone(), 8)), axis=0)
    path = str(tmp_path / "tx.sdriq")
    sdriq.write(path, raw, sample_rate=384_000)
    info = sdriq.read_header(path)
    assert info.n_samples == len(raw)

    x = raw.astype(np.float32) / 32768.0
    c = (x[:, 0] + 1j * x[:, 1])[4096:]
    spec = np.abs(np.fft.fft(c * np.hanning(len(c))))
    freqs = np.fft.fftfreq(len(c), 1.0 / 384_000.0)

    def power_near(f0):
        sel = np.abs(freqs - f0) < 10_000.0
        return spec[sel].max()

    noise = np.median(spec)
    assert power_near(60_000.0) > 50 * noise
    assert power_near(-90_000.0) > 50 * noise


@pytest.mark.slow
def test_tx_runs_continuously_past_64_blocks(tmp_path):
    """The Tx worker streams to .sdriq incrementally and does NOT stop on
    its own (r1 bug: a 64-block break silently finished a 'running' set;
    the reference's DSPDeviceSinkEngine work loop runs until stopped)."""
    import os
    import time

    from sdrangel_tpu.runtime.session import Session

    s = Session()
    ds = s.add_device_set("tx")
    ds.sink.file_path = str(tmp_path / "cont.sdriq")
    ds.add_channel("sdrangel.channeltx.modnfm", {"toneFrequency": 800.0})
    ds.start()
    deadline = time.time() + 120.0
    size_at_64 = None
    while time.time() < deadline:
        if ds.blocks_processed >= 80:
            break
        if ds.blocks_processed >= 64 and size_at_64 is None:
            size_at_64 = os.path.getsize(ds.sink.file_path)
        if not ds.running:
            raise AssertionError(f"tx stopped early: {ds.error}")
        time.sleep(0.02)
    assert ds.blocks_processed >= 80, "tx did not pass 64 blocks"
    assert ds.running and not ds.error
    ds.stop()
    # the stream was flushed incrementally and is a valid capture
    from sdrangel_tpu.io import sdriq

    info, mm = sdriq.open_mmap(ds.sink.file_path)
    assert info.n_samples > 0
    final = os.path.getsize(ds.sink.file_path)
    assert size_at_64 is None or final > size_at_64


def test_tx_session_cw_keyer_source(tmp_path):
    """cwText on a Tx channel keys its tone with the Morse envelope (the
    CWKeyer-feeds-Tx-channels role, sdrbase/dsp/cwkeyer.h:141): the
    recorded baseband shows on/off keying with the PARIS dot timing."""
    import time

    from sdrangel_tpu.runtime.session import Session

    s = Session()
    ds = s.add_device_set("tx")
    ds.sink.file_path = str(tmp_path / "cw.sdriq")
    ds.update_source({"sample_rate": 48_000.0})
    # SSB: suppressed carrier, so the baseband envelope follows the keyed AF
    ds.add_channel("sdrangel.channeltx.modssb", {
        "toneFrequency": 700.0, "cwText": "e e", "cwWpm": 30.0,
    })
    ds.start()
    deadline = time.time() + 120.0
    while time.time() < deadline and ds.blocks_processed < 12:
        assert ds.running or not ds.error, ds.error
        time.sleep(0.02)
    ds.stop()
    assert not ds.error, ds.error

    info, mm = sdriq.open_mmap(ds.sink.file_path)
    x = np.asarray(mm[: 12 * 4096]).astype(np.float32) / 32768.0
    env = np.abs(x[:, 0] + 1j * x[:, 1])
    # smooth over ~2 ms and threshold into key-down spans
    k = 96
    sm = np.convolve(env, np.ones(k) / k, mode="same")
    on = sm > 0.5 * sm.max()
    edges = np.flatnonzero(np.diff(on.astype(np.int8)))
    assert len(edges) >= 4, "no keying transitions found"
    spans = np.diff(edges)
    # dot at 30 wpm = 1.2/30 s = 40 ms = 1920 samples at 48 kHz
    dot = 1.2 / 30.0 * 48_000.0
    downs = [sp for i, sp in enumerate(spans) if on[edges[i] + 1]]
    assert downs, spans
    assert any(abs(sp - dot) < 0.35 * dot for sp in downs), (downs, dot)


def test_tx_session_wav_file_source(tmp_path):
    """afFile feeds a Tx channel from a looped 48 kHz WAV (the audio *input*
    path: the reference modulators pull a sound-card/file AudioFifo,
    nfmmod.cpp pullAudio): NFM-modulate the file, demod back, recover the
    file's tone."""
    import time
    import wave

    from sdrangel_tpu.runtime.engine import ChannelSpec, DeviceConfig, RxPipeline
    from sdrangel_tpu.runtime.session import Session

    tone = 800.0
    wav_path = str(tmp_path / "voice.wav")
    t = np.arange(9600) / 48000.0  # 0.2 s, loops
    pcm = np.clip(np.sin(2 * np.pi * tone * t) * 0.8 * 32768, -32768,
                  32767).astype(np.int16)
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(48000)
        w.writeframes(pcm.tobytes())

    s = Session()
    ds = s.add_device_set("tx")
    ds.sink.file_path = str(tmp_path / "fm.sdriq")
    ds.update_source({"sample_rate": 192_000.0, "log2_interp": 2})
    ds.add_channel("sdrangel.channeltx.modnfm", {"afFile": wav_path})
    ds.start()
    deadline = time.time() + 120.0
    while time.time() < deadline and ds.blocks_processed < 8:
        assert ds.running or not ds.error, ds.error
        time.sleep(0.02)
    ds.stop()
    assert not ds.error, ds.error

    # demod the recorded capture back with the Rx chain
    info, mm = sdriq.open_mmap(ds.sink.file_path)
    rx = RxPipeline(
        DeviceConfig(sample_rate=192_000.0, log2_decim=2),
        [ChannelSpec("sdrangel.channel.nfmdemod", 0.0,
                     {"squelch_db": -100.0, "squelch_gate_ms": 1.0})],
        block_size=1 << 14,
    )
    state = rx.init_state()
    raw = np.asarray(mm[: 2 * rx.device_block])
    import jax.numpy as jnp

    audio = []
    for b in range(2):
        state, outs = rx._step(
            state, jnp.asarray(raw[b * rx.device_block:(b + 1) * rx.device_block]))
        audio.append(np.asarray(outs["channels"][0]["audio"]))
    a = np.concatenate(audio)[4096:]  # skip filter settle
    assert _tone_snr(a, tone, 48000.0) > 10.0


def test_tx_grouped_banks_mixed_kinds(tmp_path):
    """Channel-parallel Tx: same-kind channels coalesce into one batched
    group (ThreadedBasebandSampleSource role as a batch axis); a mixed
    NFM+NFM+AM set runs as 2 groups and every channel demods back."""
    device = TxDeviceConfig(sample_rate=384_000.0, log2_interp=2)
    specs = [
        TxChannelSpec("sdrangel.channeltx.modnfm", -24_000.0, {}),
        TxChannelSpec("sdrangel.channeltx.modnfm", 24_000.0, {}),
        TxChannelSpec("sdrangel.channeltx.modam", 0.0, {}),
    ]
    pipe = TxPipeline(device, specs, block_af=4096)
    assert len(pipe.groups) == 2  # two NFMs batched, AM alone
    assert sorted(len(g[0]) for g in pipe.groups) == [1, 2]

    tones = [700.0, 1100.0, 900.0]

    def af(b, c, count):
        t = (b * count + np.arange(count)) / 48000.0
        return np.sin(2 * np.pi * tones[c] * t).astype(np.float32)

    blocks = list(pipe.run(af, 6))
    raw = np.concatenate(blocks)

    rx = RxPipeline(
        DeviceConfig(sample_rate=384_000.0, log2_decim=2),
        [ChannelSpec("sdrangel.channel.nfmdemod", -24_000.0,
                     {"squelch_db": -100.0, "squelch_gate_ms": 1.0}),
         ChannelSpec("sdrangel.channel.nfmdemod", 24_000.0,
                     {"squelch_db": -100.0, "squelch_gate_ms": 1.0}),
         ChannelSpec("sdrangel.channel.amdemod", 0.0,
                     {"squelch_db": -100.0})],
        block_size=1 << 14,
    )
    import jax.numpy as jnp

    state = rx.init_state()
    audio = [[] for _ in range(3)]
    for b in range(len(raw) // rx.device_block):
        state, outs = rx._step(
            state, jnp.asarray(raw[b * rx.device_block:(b + 1) * rx.device_block]))
        for c in range(3):
            audio[c].append(np.asarray(outs["channels"][c]["audio"]))
    for c in range(3):
        a = np.concatenate(audio[c])[4096:]
        assert _tone_snr(a, tones[c], 48000.0) > 8.0, (c, tones[c])


@pytest.mark.slow
def test_daemonsink_tx_to_daemonsource_rx_over_lossy_relay(tmp_path):
    """sdrdaemonsink role (VERDICT r2 #5): a Tx session streams modulated IQ
    as FEC superframes (sink kind "daemonsink") through a lossy UDP relay
    into an Rx session's daemonsource device set; the NFM demod recovers the
    tone through the losses.

    The path is real-time (throttled UDP pacing + a 5 s receive timeout in
    the daemonsource reader), so a loaded machine can starve it — one
    retry before failing; the helper's try/finally covers the session
    starts so a failed attempt cannot leak a running Tx into the retry."""
    for attempt in range(2):
        try:
            _daemonsink_lossy_relay_roundtrip(tmp_path)
            return
        except (AssertionError, OSError):
            if attempt == 1:
                raise


def _daemonsink_lossy_relay_roundtrip(tmp_path):
    import socket as _socket
    import threading as _t
    import time

    from sdrangel_tpu.runtime.session import Session

    # lossy relay: drop every 16th datagram (~6% — within the FEC budget
    # of 24/152 blocks; 128 data blocks must survive per superframe)
    relay = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    relay.bind(("127.0.0.1", 0))
    relay.settimeout(0.2)
    relay_port = relay.getsockname()[1]
    # reserve a free UDP port for the Rx daemonsource (a fixed port collided
    # with a not-yet-reaped socket from a previous suite process)
    probe = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    rx_port = probe.getsockname()[1]
    probe.close()
    stop = _t.Event()

    def pump():
        k = 0
        while not stop.is_set():
            try:
                raw, _ = relay.recvfrom(4096)
                k += 1
                if k % 16 == 0:
                    continue
                # sendto stays inside the try: before the Rx binds, the ICMP
                # port-unreachable surfaces here and must not kill the pump
                relay.sendto(raw, ("127.0.0.1", rx_port))
            except (TimeoutError, OSError):
                continue

    pump_t = _t.Thread(target=pump, daemon=True)
    pump_t.start()

    # Tx session: NFM modulator at +20 kHz, daemonsink to the relay
    s_tx = Session()
    ds_tx = s_tx.add_device_set("tx")
    ds_tx.update_source({
        "kind": "daemonsink", "sample_rate": 96_000.0, "log2_interp": 1,
        "daemon_address": "127.0.0.1", "daemon_port": relay_port,
        "daemon_fec": 24, "throttle": True,
    })
    ds_tx.add_channel("sdrangel.channeltx.modnfm",
                      {"inputFrequencyOffset": 20_000.0,
                       "toneFrequency": 1000.0, "fm_deviation": 5000.0})

    # Rx session: daemonsource + NFM demod at +20 kHz
    s_rx = Session()
    ds_rx = s_rx.add_device_set("rx")
    ds_rx.update_source({"kind": "daemonsource", "daemon_port": rx_port,
                         "sample_rate": 96_000.0})
    ds_rx.add_channel("sdrangel.channel.nfmdemod",
                      {"inputFrequencyOffset": 20_000.0,
                       "squelch_db": -60.0, "squelch_gate_ms": 1.0})

    # The finally must cover the STARTS too: a failed attempt that leaked a
    # running Tx session + pump thread into the retry would make the retry
    # itself flakier (review finding r3).
    audio = np.zeros(0, np.float32)
    try:
        # Tx first: its jit compile takes tens of seconds and the
        # daemonsource reader raises after a 5 s receive timeout if
        # nothing arrives
        ds_tx.start()
        deadline = time.time() + 120
        while (time.time() < deadline and ds_tx.blocks_processed < 3
               and not ds_tx.error):
            time.sleep(0.5)
        assert not ds_tx.error, ds_tx.error
        ds_rx.start()
        deadline = time.time() + 240
        while time.time() < deadline:
            time.sleep(0.5)
            if ds_tx.error or ds_rx.error:
                break
            got = ds_rx.drain_audio(0)
            if got.size:
                audio = np.concatenate([audio, got.ravel()])
            if audio.size >= 48000:
                break
    finally:
        ds_tx.stop()
        ds_rx.stop()
        stop.set()
        pump_t.join(timeout=3)
        relay.close()
    assert not ds_tx.error, ds_tx.error
    assert not ds_rx.error, ds_rx.error
    assert audio.size >= 24000, f"only {audio.size} audio samples"
    # the network source emits silence during stream gaps (sender compile,
    # dropped superframes beyond FEC) — measure the longest active run
    active = np.abs(audio) > 1e-4
    edges = np.flatnonzero(np.diff(np.concatenate([[0], active.view(np.int8), [0]])))
    runs = list(zip(edges[0::2], edges[1::2]))
    start, end = max(runs, key=lambda r: r[1] - r[0])
    a = audio[start:end]
    assert a.size >= 16000, f"longest active run only {a.size}"
    a = a[a.size // 4:]
    a = a - a.mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
    tone = np.abs(freqs - 1000.0) < 10 * 48000.0 / len(a)
    snr = 10 * np.log10(spec[tone].sum() / max(spec[~tone & (freqs > 100)].sum(), 1e-30))
    assert snr > 15.0, f"daemonsink->daemonsource audio SNR {snr:.1f} dB"
