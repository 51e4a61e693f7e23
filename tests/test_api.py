"""REST API + session tests: drive the server over HTTP end-to-end."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from sdrangel_tpu.api.server import make_server
from sdrangel_tpu.runtime.session import Session


@pytest.fixture()
def api():
    session = Session()
    srv = make_server(session, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    yield base, session
    srv.shutdown()


def _req(base, path, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_instance_summary(api):
    base, _ = api
    code, body = _req(base, "/sdrangel")
    assert code == 200
    assert body["appname"] == "sdrangel_tpu"
    assert body["dspRxBits"] == 16
    assert body["devicesetlist"]["devicesetcount"] == 0


def test_unknown_path_404(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/bogus")
    assert code == 404 and "message" in body


def test_full_control_flow(api):
    """Create device set → configure synthetic FM source → add NFM channel →
    run → report shows signal → reconfigure offset → stop."""
    base, _ = api
    code, body = _req(base, "/sdrangel/devicesets", "POST")
    assert code == 201 and body["index"] == 0

    code, body = _req(
        base, "/sdrangel/deviceset/0/device/settings", "PATCH",
        {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
         "carrier_freq": 20000.0, "tone_freq": 1000.0, "log2_decim": 0},
    )
    assert code == 200 and body["carrier_freq"] == 20000.0

    code, body = _req(
        base, "/sdrangel/deviceset/0/channel", "POST",
        {"channelType": "sdrangel.channel.nfmdemod",
         "inputFrequencyOffset": 20000.0, "squelch_db": -60.0},
    )
    assert code == 201 and body["index"] == 0

    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings")
    assert code == 200
    assert body["channelType"] == "sdrangel.channel.nfmdemod"
    assert body["inputFrequencyOffset"] == 20000.0

    code, _ = _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    assert code == 200

    deadline = time.time() + 60
    power = -200.0
    while time.time() < deadline:
        code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
        assert code == 200
        power = rep["channelPowerDB"]
        if rep["audioSamples"] > 0 and power > -30:
            break
        time.sleep(0.5)
    assert power > -30, f"no signal power reported: {power}"

    code, body = _req(
        base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
        {"inputFrequencyOffset": 25000.0},
    )
    assert code == 200 and body["inputFrequencyOffset"] == 25000.0

    code, body = _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert code == 200 and body["state"] == "idle"

    code, body = _req(base, "/sdrangel")
    assert body["devicesetlist"]["deviceSets"][0]["state"] == "idle"


def test_presets_roundtrip(api):
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(
        base, "/sdrangel/deviceset/0/channel", "POST",
        {"channelType": "sdrangel.channel.amdemod", "inputFrequencyOffset": -5000.0},
    )
    code, body = _req(base, "/sdrangel/preset", "POST",
                      {"groupName": "test", "name": "one"})
    assert code == 200
    code, body = _req(base, "/sdrangel/presets")
    assert body["presets"] == ["test/one"]

    # wipe and restore
    _req(base, "/sdrangel/devicesets", "DELETE")
    code, _ = _req(base, "/sdrangel/preset/load", "POST",
                   {"groupName": "test", "name": "one"})
    assert code == 200
    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings")
    assert code == 200
    assert body["channelType"] == "sdrangel.channel.amdemod"
    assert body["inputFrequencyOffset"] == -5000.0


def test_logging_endpoint(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/logging", "PUT", {"consoleLevel": "WARNING"})
    assert code == 200
    code, body = _req(base, "/sdrangel/logging")
    assert body["consoleLevel"] == "WARNING"


def test_channels_listing(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/channels")
    assert code == 200
    uris = [c["uri"] for c in body["channels"]]
    assert "sdrangel.channel.nfmdemod" in uris
    assert "sdrangel.channel.bfm" in uris


def test_preset_persistence(tmp_path):
    import json

    from sdrangel_tpu.runtime.session import Session

    path = str(tmp_path / "presets.json")
    s1 = Session(preset_path=path)
    s1.add_device_set()
    s1.device_sets[0].add_channel("sdrangel.channel.amdemod")
    s1.save_preset("g", "p")
    s2 = Session(preset_path=path)
    assert "g/p" in s2.presets
    s2.load_preset("g", "p")
    assert s2.device_sets[0].channels[0].uri == "sdrangel.channel.amdemod"


def test_spectrum_endpoint(api):
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, body = _req(base, "/sdrangel/deviceset/0/spectrum")
    assert code == 404  # not running yet
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "carrier_freq": 30000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod"})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    body = None
    while time.time() < deadline:
        code, body = _req(base, "/sdrangel/deviceset/0/spectrum")
        if code == 200:
            break
        time.sleep(0.5)
    _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert code == 200 and body["fftSize"] == 1024
    spec = np.asarray(body["spectrum"])
    # the +30 kHz FM signal peaks in the upper half (negative freqs first);
    # with deviation 5 kHz the spectral peak sits near carrier ± deviation
    peak = spec.argmax()
    expect = 512 + int(30000.0 / 192000.0 * 1024)
    dev_bins = int(6000.0 / 192000.0 * 1024) + 2
    assert abs(peak - expect) <= dev_bins, (peak, expect)


def test_tx_device_set_flow(api, tmp_path):
    """Create a Tx device set, configure the NFM modulator, run, verify the
    recorded .sdriq contains the placed carrier."""
    base, _ = api
    code, body = _req(base, "/sdrangel/devicesets", "POST", {"direction": "tx"})
    assert code == 201 and body["direction"] == "tx"
    out_path = str(tmp_path / "tx.sdriq")
    code, body = _req(
        base, "/sdrangel/deviceset/0/device/settings", "PATCH",
        {"file_path": out_path, "sample_rate": 192000.0},
    )
    assert code == 200 and body["file_path"] == out_path
    code, body = _req(
        base, "/sdrangel/deviceset/0/channel", "POST",
        {"channelType": "sdrangel.channeltx.modnfm",
         "inputFrequencyOffset": 30000.0, "toneFrequency": 800.0},
    )
    assert code == 201
    code, _ = _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    assert code == 200
    deadline = time.time() + 90
    while time.time() < deadline:
        code, body = _req(base, "/sdrangel/deviceset/0")
        if body["state"] == "idle":  # worker finished its bounded capture
            break
        time.sleep(0.5)
    from sdrangel_tpu.io import sdriq

    info = sdriq.read_header(out_path)
    assert info.sample_rate == 192000
    _, mm = sdriq.open_mmap(out_path)
    iq = sdriq.to_complex64(sdriq.read_block(mm, 0, min(info.n_samples, 1 << 16), wrap=False))
    spec = np.abs(np.fft.fft(iq[4096:] * np.hanning(len(iq) - 4096)))
    freqs = np.fft.fftfreq(len(iq) - 4096, 1.0 / 192000.0)
    peak = freqs[spec.argmax()]
    assert abs(peak - 30000.0) < 6000.0, peak


def test_devices_listing(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/devices")
    assert code == 200
    kinds = [d["kind"] for d in body["devices"]]
    assert set(kinds) == {"testsource", "filesource", "daemonsource"}


def test_daemon_source_end_to_end(api):
    """Network ingest: a DaemonSender streams FM superframes over localhost
    UDP; a daemonsource device set demodulates them (the SDRdaemon pairing,
    'multi-node without a cluster', SURVEY §4.4)."""
    import threading as _t

    from sdrangel_tpu.io import daemon as iod
    from sdrangel_tpu.io import testsource as ts

    base, _ = api
    port = 19917
    code, _ = _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "daemonsource", "daemon_port": port, "sample_rate": 96000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod", "squelch_db": -60.0})

    stop = _t.Event()

    def feeder():
        tx = iod.DaemonSender("127.0.0.1", port, n_fec=4, sample_rate=96000)
        cfg = ts.TestSourceConfig(sample_rate=96000.0, modulation="fm",
                                  tone_freq=1000.0, fm_deviation=5000.0, amplitude=0.4)
        n = 16000  # fits one superframe (64 kB payload room)
        b = 0
        while not stop.is_set():
            c = ts.generate(cfg, n, start_sample=b * n)
            raw = np.empty((n, 2), np.int16)
            raw[:, 0] = np.clip(c.real * 32768, -32768, 32767)
            raw[:, 1] = np.clip(c.imag * 32768, -32768, 32767)
            tx.send_iq(raw)
            b += 1
            time.sleep(0.02)
        tx.close()

    t = _t.Thread(target=feeder, daemon=True)
    t.start()
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 90
    power = -200.0
    try:
        while time.time() < deadline:
            code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
            power = rep.get("channelPowerDB", -200.0)
            if rep.get("audioSamples", 0) > 0 and power > -30:
                break
            time.sleep(0.5)
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
        stop.set()
        t.join(timeout=5)
    assert power > -30, f"daemon-source power {power}"


def test_audio_endpoint_returns_wav(api):
    """Demodulated audio fetched over HTTP as a playable WAV."""
    import io as _io
    import wave as _wave

    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
          "carrier_freq": 20000.0, "tone_freq": 1000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 20000.0, "squelch_db": -60.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    data = b""
    while time.time() < deadline:
        req = urllib.request.Request(base + "/sdrangel/deviceset/0/channel/0/audio")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        if len(data) > 44 + 2 * 48000:  # at least 1 s of audio
            break
        time.sleep(0.5)
    _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    with _wave.open(_io.BytesIO(data)) as w:
        assert w.getframerate() == 48000
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), np.int16).astype(np.float64) / 32768.0
    assert n > 48000
    a = pcm[len(pcm) // 2 :]
    spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / 48000.0)
    tone = np.abs(freqs - 1000.0) < 8 * 48000.0 / len(a)
    snr = 10 * np.log10(spec[tone].sum() / max(spec[~tone].sum(), 1e-30))
    assert snr > 20.0, snr


def test_scope_endpoint(api):
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "none",
          "carrier_freq": 1000.0, "amplitude": 0.5})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod"})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    body = None
    code = 0
    while time.time() < deadline:
        code, body = _req(base, "/sdrangel/deviceset/0/scope")
        if code == 200:
            break
        time.sleep(0.5)
    _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert code == 200 and body["length"] == 1024
    mag = np.asarray(body["traces"]["magdb"])
    re_t = np.asarray(body["traces"]["real"])
    # a 0.5-amplitude carrier: magdb ~ -6 dB, real trace oscillates
    assert abs(np.median(mag) - (-6.0)) < 1.5, np.median(mag)
    assert re_t.max() > 0.3 and re_t.min() < -0.3


def test_preset_with_tx_set(api):
    """Presets serialize/restore mixed Rx+Tx device sets (direction-aware)."""
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST", {})
    _req(base, "/sdrangel/devicesets", "POST", {"direction": "tx"})
    _req(base, "/sdrangel/deviceset/1/channel", "POST",
         {"channelType": "sdrangel.channeltx.modam", "inputFrequencyOffset": 12000.0})
    code, _ = _req(base, "/sdrangel/preset", "POST", {"groupName": "g", "name": "tx"})
    assert code == 200
    _req(base, "/sdrangel/devicesets", "DELETE")
    _req(base, "/sdrangel/devicesets", "DELETE")
    code, _ = _req(base, "/sdrangel/preset/load", "POST", {"groupName": "g", "name": "tx"})
    assert code == 200
    code, body = _req(base, "/sdrangel")
    sets = body["devicesetlist"]["deviceSets"]
    assert len(sets) == 2
    assert sets[1]["direction"] == "tx"
    assert sets[1]["channels"][0]["inputFrequencyOffset"] == 12000.0


def test_openapi_document(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/openapi")
    assert code == 200
    assert body["openapi"].startswith("3.")
    assert "/sdrangel/deviceset/{i}/channel/{j}/audio" in body["paths"]


def test_commands_api(api):
    """Store and run a user command with API-address substitution
    (sdrbase/commands role)."""
    base, _ = api
    code, _ = _req(base, "/sdrangel/command", "POST",
                   {"name": "whoru", "command": "echo", "args": "api at %1"})
    assert code == 201
    code, body = _req(base, "/sdrangel/commands")
    assert body["commands"] == ["whoru"]
    code, body = _req(base, "/sdrangel/command/whoru/run", "POST")
    assert code == 200
    assert body["returncode"] == 0
    assert "api at 127.0.0.1:" in body["stdout"]


def test_channel_wav_file_egress(api, tmp_path):
    """A channel with audioFile set records its demod audio continuously."""
    import wave as _wave

    base, _ = api
    out = str(tmp_path / "rec.wav")
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
          "carrier_freq": 20000.0, "tone_freq": 1000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 20000.0, "squelch_db": -60.0,
          "audioFile": out})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    while time.time() < deadline:
        code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
        if rep.get("audioSamples", 0) > 96000:
            break
        time.sleep(0.5)
    _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    with _wave.open(out) as w:
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), np.int16).astype(np.float64) / 32768.0
    assert n > 48000
    a = pcm[len(pcm) // 2 :]
    spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / 48000.0)
    tone = np.abs(freqs - 1000.0) < 8 * 48000.0 / len(a)
    assert 10 * np.log10(spec[tone].sum() / max(spec[~tone].sum(), 1e-30)) > 20.0


def test_malformed_json_400(api):
    """Malformed or non-object JSON bodies are 400, not silently ignored."""
    base, _ = api
    req = urllib.request.Request(
        base + "/sdrangel/devicesets", data=b"{not json", method="POST")
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req):
            code = 200
    except urllib.error.HTTPError as e:
        code = e.code
        body = json.loads(e.read())
        assert "malformed" in body["message"]
    assert code == 400
    code, body = _req(base, "/sdrangel/devicesets", "POST", body=[1, 2])
    assert code == 400 and "object" in body["message"]


def test_channel_settings_validation_400(api):
    """Unknown setting keys and missing channelType fail fast with 400."""
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, body = _req(base, "/sdrangel/deviceset/0/channel", "POST",
                      {"inputFrequencyOffset": 0.0})
    assert code == 400 and "channelType" in body["message"]
    code, body = _req(base, "/sdrangel/deviceset/0/channel", "POST",
                      {"channelType": "sdrangel.channel.nfmdemod",
                       "fmDeviation": 5000.0})  # wrong name: fm_deviation
    assert code == 400 and "fmDeviation" in body["message"]
    code, _ = _req(base, "/sdrangel/deviceset/0/channel", "POST",
                   {"channelType": "sdrangel.channel.nfmdemod",
                    "fm_deviation": 5000.0})
    assert code == 201
    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
                      {"bogus_knob": 1})
    assert code == 400 and "bogus_knob" in body["message"]


def test_channel_settings_schema(api):
    """/sdrangel/channels surfaces each type's settable fields + defaults."""
    base, _ = api
    code, body = _req(base, "/sdrangel/channels")
    assert code == 200
    by_uri = {c["uri"]: c for c in body["channels"]}
    nfm = by_uri["sdrangel.channel.nfmdemod"]["settings"]
    assert nfm["fm_deviation"] == {"type": "float", "default": 5000.0}
    assert "squelch_db" in nfm and "channel_rate" not in nfm
    assert "inputFrequencyOffset" in body["sessionKeys"]


def test_channel_udp_rtp_audio_egress(api):
    """audioUdp / audioRtp channel settings stream the demod audio as UDP
    mono16 datagrams and RTP L16 packets (the AudioNetSink roles)."""
    import socket

    from sdrangel_tpu.io.rtp import parse_packet
    from sdrangel_tpu.io.udp import decode_payload

    udp_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    udp_rx.bind(("127.0.0.1", 0))
    udp_rx.settimeout(30.0)
    rtp_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rtp_rx.bind(("127.0.0.1", 0))
    rtp_rx.settimeout(30.0)

    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
          "carrier_freq": 20000.0, "tone_freq": 1000.0})
    code, _body = _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 20000.0, "squelch_db": -60.0,
          "audioUdp": f"127.0.0.1:{udp_rx.getsockname()[1]}",
          "audioRtp": f"127.0.0.1:{rtp_rx.getsockname()[1]}"})
    assert code == 201
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    try:
        chunks = [decode_payload(udp_rx.recv(4096), "mono16") for _ in range(40)]
        pkts = [parse_packet(rtp_rx.recv(4096)) for _ in range(10)]
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
        udp_rx.close()
        rtp_rx.close()

    audio = np.concatenate(chunks)
    a = audio - audio.mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
    tone = np.abs(freqs - 1000.0) < 8 * 48000.0 / len(a)
    snr = 10 * np.log10(spec[tone].sum() / max(spec[~tone].sum(), 1e-30))
    assert snr > 10.0, snr
    seqs = [p["seq"] for p in pkts]
    assert all((b - a) & 0xFFFF == 1 for a, b in zip(seqs, seqs[1:]))
    assert all(p["payload_type"] in (96, 11, 10) for p in pkts)


def test_chanalyzer_data_channel(api):
    """A data channel (channel analyzer) through the session + REST /data
    endpoint: spectrum peaks at the tuned carrier, IQ trace is delivered."""
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "none",
          "carrier_freq": 20000.0})
    code, _b = _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.chanalyzer",
          "inputFrequencyOffset": 20000.0, "bandwidth": 8000.0})
    assert code == 201
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    body = None
    try:
        while time.time() < deadline:
            code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
            if rep.get("dataBlocks", 0) >= 2:
                code, body = _req(base, "/sdrangel/deviceset/0/channel/0/data")
                break
            time.sleep(0.5)
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert body is not None, "no data blocks produced"
    assert code == 200
    assert set(body["data"]) >= {"iq_real", "iq_imag", "spectrum", "channelPowerDB"}
    # the analyzer mixes the offset to DC: spectrum peak at centre bin
    spec = np.asarray(body["data"]["spectrum"], np.float64)
    peak = np.argmax(spec)
    centre = len(spec) // 2
    assert abs(peak - centre) < len(spec) // 16, (peak, centre)
    assert body["data"]["channelPowerDB"] > -40.0
    # audio endpoints answer sensibly for a data channel
    code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
    assert rep["dataKeys"] == sorted(body["data"].keys())


def test_preset_file_roundtrip(api, tmp_path):
    """Export a preset to a server-side file, wipe, import it back, load it
    (instancePresetFilePost/Put roles)."""
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 384000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.amdemod",
          "inputFrequencyOffset": 12000.0})
    code, _ = _req(base, "/sdrangel/preset", "POST",
                   {"groupName": "g", "name": "p1"})
    assert code == 200
    session.preset_dir = str(tmp_path)  # confine file I/O to the test dir
    path = str(tmp_path / "p1.json")
    code, body = _req(base, "/sdrangel/preset/file", "POST",
                      {"groupName": "g", "name": "p1", "filePath": path})
    assert code == 200 and body["exported"] == path
    # paths escaping the presets directory are rejected (ADVICE r1: the
    # unauthenticated API must not write arbitrary server-side paths)
    code, _ = _req(base, "/sdrangel/preset/file", "POST",
                   {"groupName": "g", "name": "p1",
                    "filePath": "/tmp/outside_preset_dir.json"})
    assert code == 400
    code, _ = _req(base, "/sdrangel/preset/file", "POST",
                   {"groupName": "g", "name": "p1",
                    "filePath": "../escape.json"})
    assert code == 400
    session.presets.clear()
    code, body = _req(base, "/sdrangel/preset/file", "PUT", {"filePath": path})
    assert code == 200 and body["imported"] == "g/p1"
    code, _ = _req(base, "/sdrangel/preset/load", "POST",
                   {"groupName": "g", "name": "p1"})
    assert code == 200
    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings")
    assert code == 200 and body["channelType"] == "sdrangel.channel.amdemod"
    assert body["inputFrequencyOffset"] == 12000.0
    # missing filePath and bogus path are client errors
    code, _ = _req(base, "/sdrangel/preset/file", "POST", {"name": "p1"})
    assert code == 400
    code, _ = _req(base, "/sdrangel/preset/file", "PUT",
                   {"filePath": str(tmp_path / "missing.json")})
    assert code == 404


def test_device_report(api):
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
          "carrier_freq": 10000.0})
    code, rep = _req(base, "/sdrangel/deviceset/0/device/report")
    assert code == 200 and rep["state"] == "idle"
    assert rep["sampleRate"] == 192000.0
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 10000.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    try:
        while time.time() < deadline:
            code, rep = _req(base, "/sdrangel/deviceset/0/device/report")
            if rep.get("blocksProcessed", 0) >= 1:
                break
            time.sleep(0.3)
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert rep["state"] == "running" and rep["blocksProcessed"] >= 1
    assert rep["realtimeFactor"] > 0.0


def test_profile_endpoint(api, tmp_path, monkeypatch):
    """POST /sdrangel/profile captures a JAX profiler trace while a device
    set runs (the framework's tracing surface; SURVEY.md §5). Paths are
    confined to SDRANGEL_TPU_FILES_DIR (Session.server_file_path)."""
    import os

    monkeypatch.setenv("SDRANGEL_TPU_FILES_DIR", str(tmp_path))
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
          "carrier_freq": 10000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 10000.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    out = str(tmp_path / "trace")
    try:
        code, body = _req(base, "/sdrangel/profile", "POST",
                          {"seconds": 0.5, "path": out})
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert code == 200 and body["trace"] == out
    found = []
    for root, _dirs, files in os.walk(out):
        found += [f for f in files if f.endswith((".trace.json.gz", ".xplane.pb"))]
    assert found, f"no trace artifacts under {out}"


@pytest.mark.slow
def test_tx_udp_af_ingest(api, tmp_path):
    """afUdp on a Tx channel sources the modulator AF from UDP mono16
    datagrams (the reference's channeltx/udpsink ingest role): the recorded
    capture demodulates back to the streamed tone."""
    import socket

    from sdrangel_tpu.channels import demod_nfm
    from sdrangel_tpu.dsp import decimators as dec
    from sdrangel_tpu.io import sdriq

    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST", {"direction": "tx"})
    out_path = str(tmp_path / "txudp.sdriq")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"file_path": out_path, "sample_rate": 192000.0})
    port = 47313
    code, _ = _req(base, "/sdrangel/deviceset/0/channel", "POST",
                   {"channelType": "sdrangel.channeltx.modnfm",
                    "inputFrequencyOffset": 20000.0,
                    "afUdp": f"127.0.0.1:{port}"})
    assert code == 201
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    # stream a 700 Hz tone as mono16 datagrams while the Tx worker runs
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    n_sent = 0
    deadline = time.time() + 90
    while time.time() < deadline:
        t = (n_sent + np.arange(480)) / 48000.0
        pcm = np.clip(np.sin(2 * np.pi * 700.0 * t) * 24000, -32768, 32767).astype(np.int16)
        tx.sendto(pcm.tobytes(), ("127.0.0.1", port))
        n_sent += 480
        time.sleep(0.002)
        code, body = _req(base, "/sdrangel/deviceset/0")
        if body["state"] == "idle":  # bounded Tx capture finished
            break
    tx.close()
    _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")

    info, mm = sdriq.open_mmap(out_path)
    assert info.sample_rate == 192000
    x = sdriq.read_block(mm, 0, mm.shape[0], wrap=False)
    xc = ((x[:, 0] + 1j * x[:, 1]) / 32768.0).astype(np.complex64)
    # demodulate the +20 kHz channel back to audio
    import jax.numpy as jnp

    cfg = demod_nfm.NFMConfig(channel_rate=192000.0, input_offset=20000.0,
                              block_in=(len(xc) // 512) * 512 if len(xc) < (1 << 16) else 1 << 16,
                              squelch_db=-100.0, squelch_gate_ms=1.0)
    st = demod_nfm.make_state(cfg)
    n = (len(xc) // cfg.block_in) * cfg.block_in
    audio = []
    for b in range(n // cfg.block_in):
        st, a = demod_nfm.process(st, jnp.asarray(xc[b * cfg.block_in:(b + 1) * cfg.block_in]), cfg)
        audio.append(np.asarray(a))
    a = np.concatenate(audio)
    a = a[len(a) // 4 :] - a[len(a) // 4 :].mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
    tone = np.abs(freqs - 700.0) < 8 * 48000.0 / len(a)
    snr = 10 * np.log10(spec[tone].sum() / max(spec[~tone].sum(), 1e-30))
    assert snr > 8.0, snr


def test_waterfall_and_histogram(api):
    """Spectrum history endpoints: waterfall rows accumulate and the decayed
    histogram has its hot cells at the carrier bin (GLSpectrum semantics)."""
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 192000.0, "modulation": "none",
          "carrier_freq": 24000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 24000.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    wf = None
    deadline = time.time() + 60
    try:
        while time.time() < deadline:
            code, wf = _req(base, "/sdrangel/deviceset/0/spectrum/waterfall")
            if code == 200 and wf["rows"] >= 3:
                break
            time.sleep(0.3)
        code, hist = _req(base, "/sdrangel/deviceset/0/spectrum/histogram")
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert wf and wf["rows"] >= 3 and len(wf["waterfall"][0]) == wf["fftSize"]
    assert code == 200
    h = np.asarray(hist["histogram"], np.int32)
    assert h.shape == (hist["powerBins"], hist["fftSize"])
    # hottest column should be the +24 kHz carrier bin (fft ordered
    # negative-first: bin = fft/2 + 24k/192k * fft)
    col = h.max(axis=0)
    expect = hist["fftSize"] // 2 + int(24000.0 / 192000.0 * hist["fftSize"])
    # several columns in the carrier skirt saturate; the expected bin must
    # be among the hottest and far columns must be cold
    assert col[expect] == col.max(), (int(col[expect]), int(col.max()))
    assert col[expect - 100] < col.max() / 2


def test_two_device_sets_concurrently(api):
    """Device parallelism (SURVEY §2.6 #1): two Rx device sets acquire at
    the same time, each with its own worker/pipeline, without interference."""
    base, _ = api
    for i, (cf, tone) in enumerate(((15000.0, 700.0), (-30000.0, 1100.0))):
        _req(base, "/sdrangel/devicesets", "POST")
        _req(base, f"/sdrangel/deviceset/{i}/device/settings", "PATCH",
             {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
              "carrier_freq": cf, "tone_freq": tone})
        _req(base, f"/sdrangel/deviceset/{i}/channel", "POST",
             {"channelType": "sdrangel.channel.nfmdemod",
              "inputFrequencyOffset": cf, "squelch_db": -60.0})
        _req(base, f"/sdrangel/deviceset/{i}/device/run", "POST")
    try:
        deadline = time.time() + 90
        done = [False, False]
        while time.time() < deadline and not all(done):
            for i in range(2):
                _, rep = _req(base, f"/sdrangel/deviceset/{i}/channel/0/report")
                done[i] = rep.get("audioSamples", 0) > 48000
            time.sleep(0.5)
        assert all(done), done
        tones = (700.0, 1100.0)
        for i in range(2):
            import io as _io
            import urllib.request as _rq
            import wave as _wave

            with _rq.urlopen(base + f"/sdrangel/deviceset/{i}/channel/0/audio") as r:
                buf = _io.BytesIO(r.read())
            with _wave.open(buf) as w:
                pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16) / 32768.0
            a = pcm[len(pcm) // 2 :] - pcm[len(pcm) // 2 :].mean()
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
            freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
            sel = np.abs(freqs - tones[i]) < 8 * 48000.0 / len(a)
            snr = 10 * np.log10(spec[sel].sum() / max(spec[~sel].sum(), 1e-30))
            assert snr > 10.0, (i, snr)
    finally:
        for i in range(2):
            _req(base, f"/sdrangel/deviceset/{i}/device/run", "DELETE")


def test_audio_and_location_endpoints(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/audio")
    assert code == 200 and body["nbOutputDevices"] == 0
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "audioUdp": "127.0.0.1:9999", "audioFile": "/tmp/x.wav"})
    code, body = _req(base, "/sdrangel/audio")
    kinds = {o["kind"] for o in body["outputs"]}
    assert code == 200 and kinds == {"udp", "wav"}
    code, body = _req(base, "/sdrangel/location", "PUT",
                      {"latitude": 48.86, "longitude": 2.35})
    assert code == 200
    code, body = _req(base, "/sdrangel/location")
    assert body == {"latitude": 48.86, "longitude": 2.35}
    code, _ = _req(base, "/sdrangel/location", "PUT", {"latitude": 123.0})
    assert code == 400


def test_24bit_capture_through_session(api, tmp_path):
    """A 24-bit .sdriq capture demodulates with the correct 2^23 scaling
    (SDR_RX_SCALEF policy, dsptypes.h:25-35) through the session."""
    from sdrangel_tpu.io import sdriq, testsource

    rate = 192000.0
    src = testsource.TestSourceConfig(
        sample_rate=rate, carrier_freq=20_000.0, modulation="fm",
        tone_freq=1000.0, fm_deviation=5000.0, amplitude=0.4,
    )
    # exactly 3.0 s: the tone/carrier phases wrap continuously at the
    # file-source EOF loop, so no FM clicks pollute the SNR
    iq = testsource.generate(src, int(rate) * 3)
    path = str(tmp_path / "cap24.sdriq")
    sdriq.write(path, iq, sample_rate=int(rate), sample_size=24)
    assert sdriq.read_header(path).sample_size == 24

    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "filesource", "file_path": path})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 20_000.0, "squelch_db": -60.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    deadline = time.time() + 60
    try:
        while time.time() < deadline:
            _, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
            if rep.get("audioSamples", 0) > 96000:
                break
            time.sleep(0.3)
        # power must reflect the 0.4 amplitude (~-8 dB), not be 256x off
        assert -20.0 < rep["channelPowerDB"] < 0.0, rep
        import io as _io
        import urllib.request as _rq
        import wave as _wave

        with _rq.urlopen(base + "/sdrangel/deviceset/0/channel/0/audio") as r:
            buf = _io.BytesIO(r.read())
        with _wave.open(buf) as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16) / 32768.0
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    a = pcm[len(pcm) // 2 :] - pcm[len(pcm) // 2 :].mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
    tone = np.abs(freqs - 1000.0) < 8 * 48000.0 / len(a)
    snr = 10 * np.log10(spec[tone].sum() / max(spec[~tone].sum(), 1e-30))
    assert snr > 15.0, snr


def test_spectrum_settings(api):
    """Device settings control the spectrum tap's FFT size and averaging
    (the SpectrumVis config surface)."""
    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, body = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                      {"kind": "testsource", "sample_rate": 192000.0,
                       "modulation": "none", "carrier_freq": 24000.0,
                       "spectrum_fft_size": 512, "spectrum_averaging": "none"})
    assert code == 200 and body["spectrum_fft_size"] == 512
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 24000.0})
    _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    spec = None
    deadline = time.time() + 60
    try:
        while time.time() < deadline:
            code, spec = _req(base, "/sdrangel/deviceset/0/spectrum")
            if code == 200:
                break
            time.sleep(0.3)
    finally:
        _req(base, "/sdrangel/deviceset/0/device/run", "DELETE")
    assert spec and spec["fftSize"] == 512
    arr = np.asarray(spec["spectrum"])
    peak = int(np.argmax(arr))
    assert abs(peak - (256 + 64)) <= 2  # +24 kHz of 192 kHz in 512 bins


def test_preset_and_command_delete(api):
    base, session = api
    _req(base, "/sdrangel/preset", "POST", {"groupName": "g", "name": "del"})
    code, body = _req(base, "/sdrangel/presets")
    assert "g/del" in body["presets"]
    code, body = _req(base, "/sdrangel/preset/g/del", "DELETE")
    assert code == 200 and "g/del" not in body["presets"]
    code, _ = _req(base, "/sdrangel/preset/g/del", "DELETE")
    assert code == 404

    _req(base, "/sdrangel/command", "POST",
         {"name": "hello", "command": "echo", "args": "hi"})
    code, body = _req(base, "/sdrangel/command/hello")
    assert code == 200 and body["command"] == "echo"
    code, body = _req(base, "/sdrangel/command/hello", "DELETE")
    assert code == 200 and body["commands"] == []
    code, _ = _req(base, "/sdrangel/command/hello")
    assert code == 404


def test_instance_config_roundtrip(api):
    """GET /sdrangel/config captures the whole instance; PUT restores it
    (instanceConfigGet/Put role)."""
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
         {"kind": "testsource", "sample_rate": 384000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 10000.0})
    code, config = _req(base, "/sdrangel/config")
    assert code == 200 and len(config["deviceSets"]) == 1

    # wipe, then restore from the captured config
    _req(base, "/sdrangel/devicesets", "DELETE")
    code, body = _req(base, "/sdrangel/devicesets")
    assert body["devicesetcount"] == 0
    code, restored = _req(base, "/sdrangel/config", "PUT", config)
    assert code == 200
    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings")
    assert code == 200 and body["channelType"] == "sdrangel.channel.nfmdemod"
    code, _ = _req(base, "/sdrangel/config", "PUT", {"bogus": 1})
    assert code == 400


def test_audio_prefs(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/audio")
    assert code == 200 and body["audioSampleRate"] == 48000
    assert "outputs" in body
    code, body = _req(base, "/sdrangel/audio", "PATCH", {"udpPort": 7000})
    assert code == 200 and body["udpPort"] == 7000
    code, _ = _req(base, "/sdrangel/audio", "PATCH", {"nope": 1})
    assert code == 400


def test_logging_idempotent_and_rotating(api, tmp_path, monkeypatch):
    """Repeated PUT /sdrangel/logging reconfigures ONE file handler instead
    of stacking duplicates (r1 bug: every PUT added a FileHandler), and the
    handler rotates (loggerwithfile.h:37-44 semantics)."""
    import logging as _logging

    base, _ = api
    monkeypatch.setenv("SDRANGEL_TPU_FILES_DIR", str(tmp_path))
    f1 = str(tmp_path / "a.log")
    f2 = str(tmp_path / "b.log")
    # confinement: paths outside SDRANGEL_TPU_FILES_DIR refuse (the same
    # threat model as preset files — rotation RENAMES the target)
    code, _ = _req(base, "/sdrangel/logging", "PUT",
                   {"consoleLevel": "INFO", "fileName": "/etc/hosts"})
    assert code == 400
    root = _logging.getLogger()
    before = len(root.handlers)
    code, _ = _req(base, "/sdrangel/logging", "PUT",
                   {"consoleLevel": "INFO", "fileName": f1})
    assert code == 200
    code, _ = _req(base, "/sdrangel/logging", "PUT",
                   {"consoleLevel": "INFO", "fileName": f2})
    assert code == 200
    assert len(root.handlers) == before + 1  # singleton, not stacked
    from logging.handlers import RotatingFileHandler

    fh = [h for h in root.handlers if isinstance(h, RotatingFileHandler)]
    assert len(fh) == 1 and fh[0].baseFilename == f2
    code, body = _req(base, "/sdrangel/logging")
    assert body.get("fileName") == f2
    # close it out (and check unknown level is a 400)
    code, _ = _req(base, "/sdrangel/logging", "PUT", {"consoleLevel": "NOPE"})
    assert code == 400
    code, _ = _req(base, "/sdrangel/logging", "PUT",
                   {"consoleLevel": "INFO", "fileName": ""})
    assert code == 200
    assert len([h for h in root.handlers
                if isinstance(h, RotatingFileHandler)]) == 0


def test_singular_deviceset_and_instance_delete(api):
    """POST/DELETE /sdrangel/deviceset (reference's singular paths,
    webapiadapterinterface.h instanceDeviceSetURL) + DELETE /sdrangel
    (instanceDelete, webapiadaptersrv.cpp:104-115)."""
    base, session = api
    code, body = _req(base, "/sdrangel/deviceset", "POST")
    assert code == 201 and body["direction"] == "rx"
    code, body = _req(base, "/sdrangel/deviceset?tx=1", "POST")
    assert code == 201 and body["direction"] == "tx"
    code, body = _req(base, "/sdrangel/deviceset", "DELETE")
    assert code == 200 and body["devicesetcount"] == 1
    # instance delete stops everything, 202 like the reference
    code, body = _req(base, "/sdrangel", "DELETE")
    assert code == 202 and "message" in body
    assert not session.device_sets[0].running


def test_focus_and_device_select(api):
    """PATCH focus is a 400 in a server instance (webapiadaptersrv.cpp:1004);
    PUT device selects the device kind (devicesetDevicePut)."""
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, body = _req(base, "/sdrangel/deviceset/0/focus", "PATCH", {})
    assert code == 400 and "server instance" in body["message"]
    code, body = _req(base, "/sdrangel/deviceset/0/device", "PUT",
                      {"hwType": "testsource"})
    assert code == 200 and body["kind"] == "testsource"
    code, body = _req(base, "/sdrangel/deviceset/0/device", "PUT", {})
    assert code == 400


def test_channels_report_aggregate(api):
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.nfmdemod",
          "inputFrequencyOffset": 10_000.0})
    _req(base, "/sdrangel/deviceset/0/channel", "POST",
         {"channelType": "sdrangel.channel.amdemod"})
    code, body = _req(base, "/sdrangel/deviceset/0/channels/report")
    assert code == 200 and body["channelcount"] == 2
    assert body["channels"][0]["channelType"] == "sdrangel.channel.nfmdemod"
    assert body["channels"][0]["inputFrequencyOffset"] == 10_000.0


def test_audio_parameters_and_cleanup(api):
    """instanceAudio{Input,Output}Parameters{Patch,Delete} + cleanup."""
    base, _ = api
    code, body = _req(base, "/sdrangel/audio/output/parameters", "PATCH",
                      {"udpAddress": "10.0.0.1", "copyToUDP": 1})
    assert code == 200 and body["udpAddress"] == "10.0.0.1"
    code, body = _req(base, "/sdrangel/audio")
    assert body["outputParameters"]["copyToUDP"] == 1
    code, body = _req(base, "/sdrangel/audio/input/parameters", "PATCH",
                      {"volume": 0.5})
    assert code == 200 and body["volume"] == 0.5
    # unknown key -> 400
    code, _ = _req(base, "/sdrangel/audio/input/parameters", "PATCH",
                   {"bogus": 1})
    assert code == 400
    # DELETE resets to defaults
    code, body = _req(base, "/sdrangel/audio/output/parameters", "DELETE")
    assert code == 200 and body["udpAddress"] == "127.0.0.1"
    code, body = _req(base, "/sdrangel/audio/input/cleanup", "PATCH", {})
    assert code == 200 and "input" in body["message"]


def test_dvserial(api):
    base, _ = api
    code, body = _req(base, "/sdrangel/dvserial")
    assert code == 200 and body["nbDevices"] == 0
    code, body = _req(base, "/sdrangel/dvserial?dvserial=1", "PATCH", {})
    assert code == 200 and body["dvSerialSupport"] == 1
    code, body = _req(base, "/sdrangel/dvserial")
    assert body["dvSerialSupport"] == 1


def test_openapi_schemas(api):
    """The OpenAPI document carries response schemas (SWG DTO role)."""
    base, _ = api
    code, body = _req(base, "/sdrangel/openapi")
    assert code == 200
    schemas = body["components"]["schemas"]
    for name in ("InstanceSummary", "DeviceSet", "DeviceReport",
                 "ChannelReport", "ErrorResponse"):
        assert name in schemas, name
    resp = body["paths"]["/sdrangel"]["get"]["responses"]["200"]
    ref = resp["content"]["application/json"]["schema"]["$ref"]
    assert ref.endswith("InstanceSummary")
    # every reference URL-table group the server claims is present
    for pth in ("/sdrangel/deviceset", "/sdrangel/deviceset/{i}/device",
                "/sdrangel/deviceset/{i}/focus",
                "/sdrangel/deviceset/{i}/channels/report",
                "/sdrangel/audio/input/parameters", "/sdrangel/dvserial"):
        assert pth in body["paths"], pth


def test_api_bearer_token():
    """Optional bearer-token auth: wrong/missing token -> 401 on every
    method; correct token passes (hardening for non-local binds)."""
    session = Session()
    srv = make_server(session, "127.0.0.1", 0, auth_token="s3cret")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        code, body = _req(base, "/sdrangel")
        assert code == 401
        code, _ = _req(base, "/sdrangel/devicesets", "POST")
        assert code == 401
        req = urllib.request.Request(base + "/sdrangel")
        req.add_header("Authorization", "Bearer s3cret")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert json.loads(r.read())["appname"] == "sdrangel_tpu"
    finally:
        srv.shutdown()


def test_preset_schema_migration(tmp_path):
    """v1 presets (no schema stamp, stale settings fields) migrate on load:
    unknown device/channel fields drop, missing ones take defaults, and the
    store re-saves at the current schema. Newer-than-build schemas refuse."""
    import json

    import pytest

    from sdrangel_tpu.runtime.session import (
        PRESET_SCHEMA_VERSION, Session, migrate_preset)

    v1 = {
        "group": "g", "name": "old",  # no "schema" key = v1
        "deviceSets": [{
            # no "direction" key (v1 default rx)
            "source": {"kind": "testsource", "sample_rate": 96000.0,
                       "a_removed_field": 42},  # field gone since v1
            "channels": [{
                "uri": "sdrangel.channel.nfmdemod",
                "inputFrequencyOffset": 1000.0,
                "settings": {"squelch_db": -50.0,
                             "renamed_old_knob": True},  # gone since v1
            }],
        }],
    }
    path = str(tmp_path / "presets.json")
    with open(path, "w") as f:
        json.dump({"g/old": v1}, f)

    s = Session(preset_path=path)
    assert s.presets["g/old"]["schema"] == PRESET_SCHEMA_VERSION
    s.load_preset("g", "old")
    ds = s.device_sets[0]
    assert ds.source.sample_rate == 96000.0
    assert not hasattr(ds.source, "a_removed_field")
    ch = ds.channels[0]
    assert ch.settings["squelch_db"] == -50.0
    assert "renamed_old_knob" not in ch.settings
    assert ch.frequency_offset == 1000.0

    # a document newer than this build refuses loudly
    with pytest.raises(ValueError, match="newer"):
        migrate_preset({"schema": PRESET_SCHEMA_VERSION + 1, "deviceSets": []})

    # fresh saves stamp the current schema
    s.save_preset("g", "new")
    assert s.presets["g/new"]["schema"] == PRESET_SCHEMA_VERSION


def test_preset_store_tolerates_one_newer_entry(tmp_path):
    """One preset saved by a NEWER build must not brick Session startup:
    the entry is kept verbatim (not lost on persist) and errors only when
    actually loaded."""
    import json

    import pytest

    from sdrangel_tpu.runtime.session import PRESET_SCHEMA_VERSION, Session

    path = str(tmp_path / "presets.json")
    good = {"schema": PRESET_SCHEMA_VERSION, "group": "g", "name": "ok",
            "deviceSets": []}
    future = {"schema": PRESET_SCHEMA_VERSION + 7, "group": "g",
              "name": "future", "deviceSets": []}
    with open(path, "w") as f:
        json.dump({"g/ok": good, "g/future": future}, f)

    s = Session(preset_path=path)  # must not raise
    s.load_preset("g", "ok")
    with pytest.raises(ValueError, match="newer"):
        s.load_preset("g", "future")
    s.save_preset("g", "another")
    with open(path) as f:
        persisted = json.load(f)
    assert persisted["g/future"]["schema"] == PRESET_SCHEMA_VERSION + 7


def test_run_blocks_respected_in_regular_mode():
    """run_blocks ('play once') stops a REGULAR (non-sharded) set too —
    it was previously honored only by the sharded path."""
    import time as _time

    from sdrangel_tpu.runtime.session import Session

    s = Session()
    ds = s.add_device_set()
    ds.update_source({"kind": "testsource", "sample_rate": 192000.0,
                      "modulation": "fm", "carrier_freq": 10000.0,
                      "run_blocks": 3})
    ds.add_channel("sdrangel.channel.nfmdemod",
                   {"inputFrequencyOffset": 10000.0})
    ds.start()
    t0 = _time.time()
    while ds.running and _time.time() - t0 < 60:
        _time.sleep(0.05)
    assert not ds.running and not ds.error, (ds.running, ds.error)
    assert 3 <= ds.blocks_processed <= 4, ds.blocks_processed


def test_fast_failing_start_is_restartable():
    """A worker that dies immediately (missing file) must leave
    running=False so a corrected configuration can start again."""
    import time as _time

    from sdrangel_tpu.runtime.session import Session

    s = Session()
    ds = s.add_device_set()
    ds.update_source({"kind": "filesource", "file_path": "/nonexistent.sdriq"})
    ds.add_channel("sdrangel.channel.nfmdemod")
    ds.start()
    t0 = _time.time()
    while not ds.error and _time.time() - t0 < 30:
        _time.sleep(0.02)
    assert ds.error
    _time.sleep(0.1)
    assert not ds.running  # not stuck 'running' with a dead thread
    # corrected config restarts fine
    ds.update_source({"kind": "testsource", "sample_rate": 192000.0})
    ds.error = ""
    ds.start()
    assert ds.running
    ds.stop()


def test_preset_not_mutated_by_later_patch():
    """save_preset snapshots channel settings; later PATCHes must not
    silently rewrite the saved preset (it stored the live dict)."""
    from sdrangel_tpu.runtime.session import Session

    s = Session()
    ds = s.add_device_set()
    ds.add_channel("sdrangel.channel.nfmdemod", {"volume": 1.0})
    s.save_preset("g", "snap")
    ds.update_channel(0, {"volume": 5.0})
    saved = s.presets["g/snap"]["deviceSets"][0]["channels"][0]["settings"]
    assert saved.get("volume") == 1.0, saved


def test_tx_session_keys_stripped_and_empty_tx_refuses(api):
    """Tx channels accepting session-level keys (audioUdp etc.) must not
    crash the modulator config; a Tx set with no channels errors clearly."""
    import time as _time

    base, _ = api
    _req(base, "/sdrangel/devicesets", "POST", {"direction": "tx"})
    # find the tx set index
    code, body = _req(base, "/sdrangel")
    tx_idx = next(d["index"] for d in body["devicesetlist"]["deviceSets"]
                  if d["direction"] == "tx")
    # no channels: run errors with a clear message (not IndexError)
    _req(base, f"/sdrangel/deviceset/{tx_idx}/device/run", "POST")
    for _ in range(100):
        code, rep = _req(base, f"/sdrangel/deviceset/{tx_idx}")
        if rep.get("error"):
            break
        _time.sleep(0.05)
    assert "no channels" in rep.get("error", ""), rep
    _req(base, f"/sdrangel/deviceset/{tx_idx}/device/run", "DELETE")

    # audioUdp (a SESSION_KEY) on a modulator: accepted and harmless
    code, _ = _req(base, f"/sdrangel/deviceset/{tx_idx}/channel", "POST",
                   {"channelType": "sdrangel.channeltx.modnfm",
                    "audioUdp": "127.0.0.1:4242"})
    assert code == 201
    # Rx-only audio endpoint on a Tx set: clean 400, not a dropped socket
    code, body = _req(base, f"/sdrangel/deviceset/{tx_idx}/channel/0/audio")
    assert code == 400
