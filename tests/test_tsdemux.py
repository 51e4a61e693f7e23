"""MPEG TS demux tests: PSI parse, PES reassembly, resync, and the full
DVB-S → TS → demux chain (the container layer the reference delegates to
ffmpeg in plugins/channelrx/demoddatv/datvideorender.cpp)."""

import numpy as np

from sdrangel_tpu.channels import dvbs, tsdemux


def _make_stream():
    """A tiny 2-stream programme: PAT + PMT + video/audio PES."""
    pkts = []
    pkts += tsdemux._section_packetize(0, tsdemux.make_pat({1: 0x100}), 0)
    pkts += tsdemux._section_packetize(
        0x100, tsdemux.make_pmt(1, 0x200, {0x200: 0x02, 0x201: 0x04}), 0
    )
    video = bytes(range(256)) * 4
    audio = b"\xab\xcd" * 100
    pkts += tsdemux.make_pes_packets(0x200, video, pts=900_000)
    pkts += tsdemux.make_pes_packets(0x201, audio, pts=900_300)
    return pkts, video, audio


def test_psi_and_pes_roundtrip():
    pkts, video, audio = _make_stream()
    d = tsdemux.TsDemux()
    d.feed(b"".join(pkts))
    assert 1 in d.programs
    info = d.programs[1]
    assert info.pmt_pid == 0x100 and info.pcr_pid == 0x200
    assert info.streams == {0x200: 0x02, 0x201: 0x04}
    assert d.drain_pes(0x200) == video
    assert d.drain_pes(0x201) == audio
    assert d.pts[0x200] == [900_000]
    assert d.pts[0x201] == [900_300]
    desc = d.summary()
    assert desc["programs"][0]["streams"][0]["codec"] == "MPEG-2 video"
    assert desc["continuityErrors"] == 0


def test_feed_in_fragments_and_resync():
    """Bytes may arrive in arbitrary chunks with garbage prefixes."""
    pkts, video, _ = _make_stream()
    raw = b"\x12\x34\x56" + b"".join(pkts)  # leading garbage forces resync
    d = tsdemux.TsDemux()
    for i in range(0, len(raw), 100):
        d.feed(raw[i : i + 100])
    assert d.sync_losses >= 1
    assert d.drain_pes(0x200) == video


def test_continuity_counter_detection():
    pkts, _, _ = _make_stream()
    # drop a packet in the middle of the video PES (pid 0x200 spans several)
    vid_idxs = [i for i, p in enumerate(pkts) if ((p[1] & 0x1F) << 8) | p[2] == 0x200]
    del pkts[vid_idxs[2]]
    d = tsdemux.TsDemux()
    d.feed(b"".join(pkts))
    assert d.continuity_errors >= 1


def test_demux_after_dvbs_fec_chain():
    """TS packets through DVB-S encode (conv + interleave + RS + scramble)
    and back through the receive FEC chain, then demuxed."""
    pkts, video, audio = _make_stream()
    ts = np.frombuffer(b"".join(pkts), np.uint8).reshape(-1, dvbs.TS_PACKET)
    rng = np.random.default_rng(3)
    pad = rng.integers(0, 256, size=(11, dvbs.TS_PACKET), dtype=np.uint8)

    chan = dvbs.encode_transport(np.concatenate([ts, pad])).astype(np.float64) * 2 - 1
    rx, corrected = dvbs.decode_transport(chan, len(ts))
    assert corrected == 0
    d = tsdemux.TsDemux()
    d.feed(rx)
    assert d.programs[1].streams == {0x200: 0x02, 0x201: 0x04}
    assert d.drain_pes(0x200) == video
    assert d.drain_pes(0x201) == audio


def test_section_spanning_with_pointer():
    """A long PMT whose tail shares a packet with the next section via the
    pointer field: both sections parse (the pre-pointer bytes complete the
    spanning section instead of being discarded)."""
    pat = tsdemux.make_pat({9: 0x150})
    # PMT with 36 streams -> section > 184 bytes, spans two TS packets
    streams = {0x300 + i: 0x1B for i in range(36)}
    pmt = tsdemux.make_pmt(9, 0x300, streams)
    assert len(pmt) > 184

    pkts = tsdemux._section_packetize(0, pat, 0)
    # hand-pack the PMT: packet 1 = PUSI ptr 0 + first 184 bytes (incl. the
    # pointer byte); packet 2 = PUSI with ptr = remaining PMT bytes, then a
    # REPEAT of the PMT section starting right after (shared packet)
    first = pmt[:183]
    rest = pmt[183:]
    p1 = bytes([tsdemux.SYNC, 0x40 | (0x150 >> 8), 0x150 & 0xFF, 0x10]) + b"\x00" + first
    assert len(p1) == 188
    after = rest + pmt  # finish section 1, then section 2 (repeat) begins
    body = after[: 188 - 5]
    p2 = (bytes([tsdemux.SYNC, 0x40 | (0x150 >> 8), 0x150 & 0xFF, 0x11])
          + bytes([len(rest)]) + body)
    p2 = p2 + b"\xff" * (188 - len(p2))
    d = tsdemux.TsDemux()
    d.feed(b"".join(pkts) + p1 + p2)
    info = d.programs[9]
    assert len(info.streams) == 36, len(info.streams)
    assert info.pcr_pid == 0x300


def test_pes_header_spanning_packet_boundary():
    """A PES header longer than the PUSI packet's payload (stuffed
    header_len): its tail bytes arrive in the continuation packet and must
    be skipped — not leaked into the elementary stream — and the PTS (split
    across packets when header_len pushes it out) still decodes."""
    pid = 0x200
    pts = 1_234_567
    p = bytes([
        0x21 | (((pts >> 30) & 0x7) << 1),
        (pts >> 22) & 0xFF,
        0x01 | (((pts >> 15) & 0x7F) << 1),
        (pts >> 7) & 0xFF,
        0x01 | ((pts & 0x7F) << 1),
    ])
    header_len = 230  # 9 + 230 = 239 bytes of header > one 184-byte payload
    es = bytes(range(64)) * 3
    pes = (b"\x00\x00\x01\xe0\x00\x00" + bytes([0x80, 0x80, header_len])
           + p + b"\xff" * (header_len - 5) + es)
    pkts, cc, first = [], 0, True
    data = pes
    while data:
        chunk, data = data[:184], data[184:]
        hdr = bytes([tsdemux.SYNC, (0x40 if first else 0) | (pid >> 8),
                     pid & 0xFF, 0x10 | (cc & 0xF)])
        pkts.append(hdr + chunk + b"\xff" * (184 - len(chunk)))
        cc += 1
        first = False
    # last packet's 0xff padding would leak into the ES; trim es to fill
    d = tsdemux.TsDemux()
    d.pes_payloads[pid] = bytearray()
    d.feed(b"".join(pkts))
    got = d.drain_pes(pid)
    assert got[: len(es)] == es  # no header bytes leaked before the ES
    assert set(got[len(es):]) <= {0xFF}  # only TS stuffing follows
    assert d.pts[pid] == [pts]


def test_resync_rejects_payload_sync_byte():
    """Resync must not lock onto a 0x47 PAYLOAD byte: the candidate is
    confirmed by another 0x47 exactly 188 bytes later."""
    pkts, video, _ = _make_stream()
    raw = b"".join(pkts)
    # garbage prefix CONTAINING a 0x47 at a non-packet offset
    garbage = b"\x01\x02\x47\x03\x04\x05\x06"
    d = tsdemux.TsDemux()
    d.feed(garbage + raw)
    assert d.sync_losses >= 1
    assert d.drain_pes(0x200) == video  # nothing consumed by a false lock
