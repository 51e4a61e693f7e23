"""Tests: audio mixing/FIFO/compressor, RTP packetization, CW keyer."""

import numpy as np

from sdrangel_tpu.channels import cwkeyer
from sdrangel_tpu.io import audio, rtp


def test_mix_saturates():
    a = np.full(100, 0.8, np.float32)
    b = np.full(100, 0.8, np.float32)
    m = audio.mix([a, b])
    assert m.max() == 1.0  # clipped, not wrapped


def test_audio_fifo_underrun_and_overrun():
    f = audio.AudioFifo(capacity_samples=100)
    f.write(np.ones(80, np.float32))
    f.write(np.ones(80, np.float32))  # overruns
    assert f.overruns == 1
    out = f.read(150)  # underrun: zero pad
    assert out.shape == (150,)
    assert out[:100].min() == 1.0
    assert out[100:].max() == 0.0


def test_compressor_reduces_dynamics():
    loud = np.full(10, 0.9, np.float32)
    quiet = np.full(10, 0.01, np.float32)
    c_loud = audio.compress(loud, threshold_db=-20, ratio=4)
    c_quiet = audio.compress(quiet, threshold_db=-20, ratio=4)
    assert c_loud.max() < 0.9  # attenuated above threshold
    np.testing.assert_allclose(c_quiet, quiet, atol=1e-6)  # untouched below


def test_rtp_roundtrip():
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, samples_per_packet=160)
    t = np.arange(480) / 48000.0
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    sent = tx.write(tone)
    assert sent == 3
    seqs, chunks = [], []
    for _ in range(3):
        info, pcm = rx.read_packet()
        assert info["payload_type"] == rtp.PT_L16_MONO
        seqs.append(info["seq"])
        chunks.append(pcm)
    assert seqs[1] == (seqs[0] + 1) & 0xFFFF
    got = np.concatenate(chunks)
    np.testing.assert_allclose(got, tone, atol=1e-4)
    tx.close()
    rx.close()


def test_cw_keyer_envelope():
    cfg = cwkeyer.CWConfig(wpm=20.0, sample_rate=8000.0)
    k = cwkeyer.CWKeyer("e", cfg)  # single dot
    d = cfg.dot_samples
    env = k.next_block(d * 10)
    # dot present then silence (word gap)
    assert env[: d].max() == 1.0 or env[: d].max() > 0.99
    assert env[d + d // 2 :].max() == 0.0
    assert k.done()
    # edges are smooth (no instantaneous jump)
    assert abs(env[1] - env[0]) < 0.2


def test_cw_keyer_paris_timing():
    cfg = cwkeyer.CWConfig(wpm=20.0, sample_rate=8000.0)
    sched = cwkeyer.text_to_schedule("paris", cfg)
    total = sum(dur for _, dur in sched)
    # PARIS = 50 dot units exactly (standard word)
    assert total == 50 * cfg.dot_samples


def test_rtcp_sender_report_and_sdes():
    """The sender emits a compound SR+SDES on the RTP port + 1 with honest
    packet/octet counts (qrtplib rtpsession auto-SR role)."""
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    rtcp_rx = rtp.RtcpPeer("127.0.0.1", rx.port, bind=True, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, samples_per_packet=160,
                            rtcp_interval=0.0)  # SR on first write
    try:
        t = np.arange(480) / 48000.0
        tx.write(np.sin(2 * np.pi * 440 * t).astype(np.float32))
        for _ in range(3):
            rx.read_packet()
        reports = rtcp_rx.recv()
        kinds = {r["type"] for r in reports}
        assert kinds == {"SR", "SDES"}
        sr = next(r for r in reports if r["type"] == "SR")
        assert sr["ssrc"] == tx.ssrc
        assert sr["packet_count"] == 3
        assert sr["octet_count"] == 3 * 160 * 2
        sdes = next(r for r in reports if r["type"] == "SDES")
        assert sdes["cname"] == "sdrangel_tpu"
    finally:
        tx.close(); rx.close(); rtcp_rx.close()


def test_rtcp_receiver_report_stats():
    """Receiver tracks RFC 3550 A.8 stats and emits a parseable RR."""
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, samples_per_packet=160,
                            rtcp=False)
    try:
        t = np.arange(800) / 48000.0
        tx.write(np.sin(2 * np.pi * 440 * t).astype(np.float32))
        for _ in range(5):
            rx.read_packet()
        assert rx.received == 5
        assert rx.expected == 5 and rx.lost == 0
        rr = rtp.parse_rtcp(rx.receiver_report())
        assert rr[0]["type"] == "RR"
        assert rr[0]["source_ssrc"] == tx.ssrc
        assert rr[0]["cumulative_lost"] == 0
        assert rr[0]["fraction_lost"] == 0
    finally:
        tx.close(); rx.close()


def test_rtcp_rr_driven_red_adaptation():
    """RR loss feedback flips the sender into RFC 2198 redundant audio and
    the receiver reconstructs singly-lost packets from the redundant
    blocks; a clean RR flips it back (the adaptation loop qrtplib's stats
    never closed)."""
    import socket as _socket

    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    relay = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    relay.bind(("127.0.0.1", 0))
    relay.settimeout(5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", relay.getsockname()[1],
                            samples_per_packet=160, rtcp_interval=0.0)
    fb = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)  # RR return path
    try:
        tone = np.sin(2 * np.pi * 440 * np.arange(160 * 8) / 48000.0)

        def pump(n_pkts, drop_every=0):
            """Forward n_pkts sender->receiver, dropping every k-th."""
            for i in range(n_pkts):
                raw, _ = relay.recvfrom(65536)
                if drop_every and i % drop_every == drop_every - 1:
                    continue
                relay.sendto(raw, ("127.0.0.1", rx.port))

        # phase 1: plain L16 through a 25%-loss path
        assert tx.write(tone.astype(np.float32)) == 8
        pump(8, drop_every=4)
        got = [rx.read_packet() for _ in range(6)]
        assert rx.lost >= 1
        assert all(i["payload_type"] == rtp.PT_L16_MONO for i, _ in got)

        # feedback: the receiver's RR reaches the sender's RTCP socket
        fb.sendto(rx.receiver_report(), ("127.0.0.1", tx._rtcp.port))
        import time as _time
        _time.sleep(0.05)

        # phase 2: sender adapts to RED; single losses are reconstructed
        assert tx.write(tone.astype(np.float32)) == 8
        assert tx.redundant and tx.fraction_lost >= 0.05
        pump(8, drop_every=4)
        samples = 0
        for _ in range(6):
            info, pcm = rx.read_packet()
            samples += len(pcm)
        assert rx.recovered >= 1
        # 6 received packets + recovered redundant blocks cover the gaps
        assert samples >= 7 * 160, samples

        # phase 3: a clean RR (fraction 0) drops back to plain L16
        fb.sendto(
            rtp.build_rr(rx.ssrc, tx.ssrc, 0, 0, 0, 0),
            ("127.0.0.1", tx._rtcp.port))
        _time.sleep(0.05)
        assert tx.write(tone[:160 * 2].astype(np.float32)) == 2
        assert not tx.redundant
        pump(2)
        info, _ = rx.read_packet()
        assert info["payload_type"] == rtp.PT_L16_MONO
    finally:
        tx.close(); rx.close(); relay.close(); fb.close()


def test_red_stereo_large_packets_shrink_to_fit():
    """RED's 10-bit length field: stereo at 480 samples/packet (1920 B)
    must not silently truncate — the sender shrinks its packet size while
    redundant so the previous payload always fits."""
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, stereo=True,
                            samples_per_packet=480, rtcp=False)
    tx.redundant = True  # force RED
    try:
        t = np.arange(1024) / 48000.0
        audio = np.stack([np.sin(2 * np.pi * 440 * t),
                          np.cos(2 * np.pi * 440 * t)], axis=-1)
        n = tx.write(audio.astype(np.float32))
        assert n >= 4  # smaller packets (<=255 samples each)
        total = 0
        first = True
        for _ in range(n):
            info, pcm = rx.read_packet()
            assert info["payload_type"] == rtp.PT_L16_STEREO
            assert pcm.shape[1] == 2
            assert len(pcm) * 4 <= rtp.RED_MAX_BLOCK + 4
            total += len(pcm)
            first = False
        assert total >= 1020  # nothing truncated away
    finally:
        tx.close(); rx.close()


def test_red_oversized_block_raises():
    import pytest

    with pytest.raises(ValueError, match="10-bit"):
        rtp.build_red_payload(b"x", rtp.PT_L16_MONO, b"y" * 1200, 160)


def test_malformed_red_payload_does_not_crash_receiver():
    import socket as _socket

    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    s = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    try:
        # a foreign sender using dynamic PT 96 with all-high bytes
        pkt = rtp.build_packet(b"\xff" * 32, 1, 0, 0xDEAD, rtp.PT_RED)
        s.sendto(pkt, ("127.0.0.1", rx.port))
        info, pcm = rx.read_packet()
        assert info.get("malformed") and len(pcm) == 0
        # and an empty RED payload
        s.sendto(rtp.build_packet(b"", 2, 0, 0xDEAD, rtp.PT_RED),
                 ("127.0.0.1", rx.port))
        info, pcm = rx.read_packet()
        assert info.get("malformed") and len(pcm) == 0
    finally:
        s.close(); rx.close()


def test_sequence_wrap_stats_stay_sane():
    """RFC 3550 A.1: a 16-bit sequence wrap bumps cycles exactly once;
    post-wrap packets must not inflate `expected` (which previously
    latched fraction_lost at 255 and pinned the RED adaptation on)."""
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, samples_per_packet=16,
                            rtcp=False)
    tx.seq = 0xFFFE  # two packets before the wrap
    try:
        t = np.arange(16 * 50) / 48000.0
        tx.write(np.sin(2 * np.pi * 440 * t).astype(np.float32))
        for _ in range(50):
            rx.read_packet()
        assert rx.received == 50
        assert rx.expected == 50, (rx.expected, rx.cycles, rx.max_seq)
        assert rx.cycles == 1 << 16
        rr = rtp.parse_rtcp(rx.receiver_report())[0]
        assert rr["fraction_lost"] == 0
    finally:
        tx.close(); rx.close()


def test_receiver_report_fraction_is_per_interval():
    """fraction_lost covers the interval since the previous RR (RFC 3550
    A.3): a lossy interval followed by a clean one reports high then zero,
    so the sender's RED hysteresis can actually disengage."""
    rx = rtp.RtpAudioReceiver("127.0.0.1", 0, timeout=5.0)
    tx = rtp.RtpAudioSender("127.0.0.1", rx.port, samples_per_packet=16,
                            rtcp=False)
    try:
        tone = np.sin(2 * np.pi * 440 * np.arange(16 * 10) / 48000.0)
        # interval 1: drop every other packet by skipping seq
        for i in range(10):
            if i % 2:
                tx.seq = (tx.seq + 1) & 0xFFFF  # simulate a loss
            tx.write(tone[:16].astype(np.float32))
        for _ in range(10):
            rx.read_packet()
        rr1 = rtp.parse_rtcp(rx.receiver_report())[0]
        assert rr1["fraction_lost"] > 50  # ~33% of the interval
        # interval 2: clean
        tx.write(np.tile(tone[:16], 10).astype(np.float32))
        for _ in range(10):
            rx.read_packet()
        rr2 = rtp.parse_rtcp(rx.receiver_report())[0]
        assert rr2["fraction_lost"] == 0, rr2
        assert rr2["cumulative_lost"] > 0  # cumulative stays cumulative
    finally:
        tx.close(); rx.close()
