"""Live reconfiguration of a RUNNING pipeline (the reference's typed-message
applySettings path: webapiadaptersrv.cpp:1637 → nfmdemod.cpp handleMessage;
channelizer reconfig downchannelizer.cpp:111-189).

Covers the two tiers:
- dynamic knobs (squelch_db, in-passband inputFrequencyOffset) apply through
  traced args with NO pipeline rebuild (generation counter unchanged);
- static changes (out-of-passband retune, device settings) rebuild/re-jit
  between blocks while the stream keeps running.
"""

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
    yield f"http://127.0.0.1:{port}", session
    for ds in session.device_sets:
        ds.stop()
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


def _start_fm_nfm(base):
    """testsource FM carrier at +20 kHz, NFM channel tuned onto it."""
    _req(base, "/sdrangel/devicesets", "POST")
    code, _ = _req(
        base, "/sdrangel/deviceset/0/device/settings", "PATCH",
        {"kind": "testsource", "sample_rate": 192000.0, "modulation": "fm",
         "carrier_freq": 20000.0, "tone_freq": 1000.0},
    )
    assert code == 200
    code, _ = _req(
        base, "/sdrangel/deviceset/0/channel", "POST",
        {"channelType": "sdrangel.channel.nfmdemod",
         "inputFrequencyOffset": 20000.0, "squelch_db": -60.0},
    )
    assert code == 201
    code, _ = _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    assert code == 200


def _wait_audio(ds, predicate, deadline_s=90.0, min_blocks=1):
    """Poll drained audio until predicate(audio) holds; returns the audio."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        start_blocks = ds.blocks_processed
        while ds.blocks_processed < start_blocks + min_blocks:
            if not ds.running:
                raise AssertionError(f"device stopped: {ds.error}")
            time.sleep(0.05)
        audio = ds.drain_audio(0)
        if audio.size and predicate(audio):
            return audio
    raise AssertionError("condition not reached before deadline")


def test_dynamic_squelch_applies_without_rebuild(api):
    base, session = api
    _start_fm_nfm(base)
    ds = session.device_sets[0]
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05)
    gen_before = ds._gen

    # squelch to an impossible level: gate must close within ~2 blocks
    code, _ = _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
                   {"squelch_db": 10.0})
    assert code == 200
    ds.drain_audio(0)  # discard blocks that may predate the change
    _wait_audio(ds, lambda a: np.abs(a).max() < 1e-6, min_blocks=2)
    code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
    assert rep["squelch"] is False  # the kernel's gate state, not a proxy

    # reopen: audio returns
    _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
         {"squelch_db": -60.0})
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05, min_blocks=2)
    code, rep = _req(base, "/sdrangel/deviceset/0/channel/0/report")
    assert rep["squelch"] is True
    # dynamic changes traced through: no rebuild happened
    assert ds._gen == gen_before
    assert ds.running and not ds.error


def _dominant_tone(audio: np.ndarray, rate: float = 48000.0) -> float:
    mono = audio if audio.ndim == 1 else audio[:, 0]
    spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    return float(np.argmax(spec) * rate / len(mono))


def test_dynamic_retune_within_passband(api):
    """An in-passband retune rides the NCO (traced arg — no rebuild). With
    an SSB channel the retune moves the demodulated tone frequency: carrier
    at +20 kHz heard at 1 kHz from offset 19k, at 1.5 kHz from 18.5k."""
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, _ = _req(
        base, "/sdrangel/deviceset/0/device/settings", "PATCH",
        {"kind": "testsource", "sample_rate": 192000.0, "modulation": "none",
         "carrier_freq": 20000.0},
    )
    assert code == 200
    code, _ = _req(
        base, "/sdrangel/deviceset/0/channel", "POST",
        {"channelType": "sdrangel.channel.ssbdemod",
         "inputFrequencyOffset": 19000.0, "usb": True},
    )
    assert code == 201
    code, _ = _req(base, "/sdrangel/deviceset/0/device/run", "POST")
    assert code == 200
    ds = session.device_sets[0]
    audio = _wait_audio(ds, lambda a: np.abs(a).max() > 0.01)
    assert abs(_dominant_tone(audio) - 1000.0) < 50.0
    gen_before = ds._gen

    code, _ = _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
                   {"inputFrequencyOffset": 18500.0})
    assert code == 200
    ds.drain_audio(0)
    audio = _wait_audio(
        ds, lambda a: abs(_dominant_tone(a) - 1500.0) < 50.0, min_blocks=2
    )
    assert ds._gen == gen_before  # NCO retune — not a rebuild
    assert ds.running and not ds.error


def test_static_retune_rebuilds_running_pipeline(api):
    """An out-of-passband retune recomputes the channel plan (the
    DownChannelizer applyConfiguration path) without stop/start."""
    base, session = api
    _start_fm_nfm(base)
    ds = session.device_sets[0]
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05)
    gen_before = ds._gen

    code, _ = _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
                   {"inputFrequencyOffset": -60000.0})
    assert code == 200
    ds.drain_audio(0)
    _wait_audio(ds, lambda a: np.abs(a).max() < 1e-6, min_blocks=2)
    assert ds._gen > gen_before  # the worker rebuilt the plan
    assert ds.running and not ds.error

    # retune back: signal recovered by the rebuilt pipeline
    _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
         {"inputFrequencyOffset": 20000.0})
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05, min_blocks=2)
    assert ds.running and not ds.error


def test_static_channel_setting_applies_mid_run(api):
    """A non-dynamic demod setting (rf_bandwidth) bumps the generation and
    the worker rebuilds with the new config while running."""
    base, session = api
    _start_fm_nfm(base)
    ds = session.device_sets[0]
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05)
    gen_before = ds._gen
    code, _ = _req(base, "/sdrangel/deviceset/0/channel/0/settings", "PATCH",
                   {"rf_bandwidth": 25000.0})
    assert code == 200
    assert ds._gen > gen_before
    ds.drain_audio(0)
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05, min_blocks=2)
    assert ds.running and not ds.error
    code, body = _req(base, "/sdrangel/deviceset/0/channel/0/settings")
    assert body["rf_bandwidth"] == 25000.0


def test_device_settings_typed_validation(api):
    base, session = api
    _req(base, "/sdrangel/devicesets", "POST")
    code, body = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                      {"sample_rate": "fast"})
    assert code == 400 and "sample_rate" in body["message"]
    code, body = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                      {"log2_decim": 2.5})
    assert code == 400
    code, body = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                      {"no_such_setting": 1})
    assert code == 400
    # valid: ints coerce to float fields
    code, body = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                      {"sample_rate": 96000})
    assert code == 200 and body["sample_rate"] == 96000.0


def test_device_settings_change_rebuilds_mid_run(api):
    """PATCHing device settings on a running set reconfigures the front end
    between blocks (the reference restarts acquisition via messages)."""
    base, session = api
    _start_fm_nfm(base)
    ds = session.device_sets[0]
    _wait_audio(ds, lambda a: np.abs(a).max() > 0.05)
    # detune the source carrier: channel no longer sees it
    code, _ = _req(base, "/sdrangel/deviceset/0/device/settings", "PATCH",
                   {"carrier_freq": -50000.0})
    assert code == 200
    ds.drain_audio(0)
    _wait_audio(ds, lambda a: np.abs(a).max() < 1e-6, min_blocks=2)
    assert ds.running and not ds.error
