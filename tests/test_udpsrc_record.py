"""UDPSrc channel kind (channelized IQ / demod over UDP) and the Rx-side
IQ record → replay golden loop (FileRecord role).

Reference: plugins/channelrx/udpsrc/udpsrc.{h,cpp} (feed → UDPSink),
sdrbase/dsp/filerecord.{h,cpp} (record the running device stream to .sdriq,
replayed by the filesource plugin)."""

import socket
import threading
import time

import numpy as np
import pytest

from sdrangel_tpu.io import udp as udpio
from sdrangel_tpu.runtime.session import Session


def _recv_all(sock, min_bytes, deadline_s=60.0):
    chunks = []
    total = 0
    end = time.time() + deadline_s
    while total < min_bytes and time.time() < end:
        try:
            data, _ = sock.recvfrom(65536)
        except socket.timeout:
            continue
        chunks.append(data)
        total += len(data)
    return b"".join(chunks)


def _dominant(x, rate):
    x = x - x.mean()
    spec = np.abs(np.fft.fft(x * np.hanning(len(x))))
    freqs = np.fft.fftfreq(len(x), 1.0 / rate)
    return float(freqs[np.argmax(spec)])


@pytest.fixture()
def session():
    s = Session()
    yield s
    for ds in s.device_sets:
        ds.stop()


def _run_blocks(ds, n, deadline_s=90.0):
    start = ds.blocks_processed
    end = time.time() + deadline_s
    while ds.blocks_processed < start + n and time.time() < end:
        if not ds.running:
            raise AssertionError(f"device stopped: {ds.error}")
        time.sleep(0.05)
    assert ds.blocks_processed >= start + n, "blocks did not advance"


def test_udpsrc_forwards_channelized_iq(session):
    """udpsrc with fmt=iq wires the resampled channel IQ as iq16 datagrams:
    a carrier at +25 kHz, channel at +24 kHz -> received stream carries a
    +1 kHz complex tone."""
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(0.5)
    port = rx.getsockname()[1]

    session.add_device_set()
    ds = session.device_sets[0]
    ds.update_source({"kind": "testsource", "sample_rate": 192000.0,
                      "modulation": "none", "carrier_freq": 25000.0})
    ds.add_channel("sdrangel.channel.udpsrc", {
        "inputFrequencyOffset": 24000.0, "fmt": "iq", "squelch_db": -100.0,
        "udpAddress": "127.0.0.1", "udpPort": port, "udpFormat": "iq16",
    })
    ds.start()
    raw = _recv_all(rx, 4 * 48000)  # ≥0.5 s of iq16 at 48 kS/s
    ds.stop()
    rx.close()
    iq = udpio.decode_payload(raw, "iq16")
    assert len(iq) >= 24000
    tail = iq[len(iq) // 2 :]
    assert abs(_dominant(tail, 48000.0) - 1000.0) < 20.0
    rep = ds.channels[0]
    assert rep.data_blocks > 0 and rep.squelch


def test_udpsrc_nfm_demod_over_udp(session):
    """fmt=nfm forwards the discriminator output (mono16): FM carrier with a
    700 Hz tone arrives as a 700 Hz audio tone."""
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(0.5)
    port = rx.getsockname()[1]

    session.add_device_set()
    ds = session.device_sets[0]
    ds.update_source({"kind": "testsource", "sample_rate": 192000.0,
                      "modulation": "fm", "carrier_freq": 30000.0,
                      "tone_freq": 700.0})
    ds.add_channel("sdrangel.channel.udpsrc", {
        "inputFrequencyOffset": 30000.0, "fmt": "nfm", "squelch_db": -100.0,
        "udpAddress": "127.0.0.1", "udpPort": port, "udpFormat": "mono16",
    })
    ds.start()
    raw = _recv_all(rx, 2 * 48000)
    ds.stop()
    rx.close()
    audio = udpio.decode_payload(raw, "mono16")
    assert len(audio) >= 24000
    tail = audio[len(audio) // 2 :]
    f = abs(_dominant(tail, 48000.0))
    assert abs(f - 700.0) < 20.0


def test_record_then_replay_golden(session, tmp_path):
    """FileRecord loop: record the running Rx device stream to .sdriq, then
    replay it through a filesource device set — the replayed NFM audio
    carries the same tone (the reference's record/replay golden strategy,
    SURVEY §4.3)."""
    path = str(tmp_path / "cap.sdriq")
    session.add_device_set()
    ds = session.device_sets[0]
    ds.update_source({"kind": "testsource", "sample_rate": 192000.0,
                      "modulation": "fm", "carrier_freq": 20000.0,
                      "tone_freq": 900.0, "record_file": path})
    ds.add_channel("sdrangel.channel.nfmdemod",
                   {"inputFrequencyOffset": 20000.0, "squelch_db": -100.0})
    ds.start()
    _run_blocks(ds, 4)
    ds.stop()

    from sdrangel_tpu.io import sdriq

    info, mm = sdriq.open_mmap(path)
    assert info.sample_rate == 192000
    assert info.n_samples > 0

    # replay: filesource device set over the capture
    session.add_device_set()
    ds2 = session.device_sets[1]
    ds2.update_source({"kind": "filesource", "file_path": path})
    ds2.add_channel("sdrangel.channel.nfmdemod",
                    {"inputFrequencyOffset": 20000.0, "squelch_db": -100.0})
    ds2.start()
    _run_blocks(ds2, 3)
    ds2.stop()
    audio = ds2.drain_audio(0)
    assert audio.size > 4096
    tail = audio[audio.size // 2 :]
    assert abs(abs(_dominant(tail, 48000.0)) - 900.0) < 25.0
