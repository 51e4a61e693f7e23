"""Minimal RTP packetization for audio egress — the qrtplib role.

Reference: sdrbase/audio/audionetsink.{h,cpp} can emit demod audio either as
raw UDP or RTP via the vendored qrtplib (qrtplib/rtpsession.h). This is a
from-scratch RFC 3550 header packetizer/parser over a plain UDP socket —
enough for L16 mono/stereo audio interop.
"""

from __future__ import annotations

import secrets
import socket
import struct

import numpy as np

RTP_VERSION = 2
PT_L16_MONO = 11  # RFC 3551 static payload types
PT_L16_STEREO = 10

_HDR = struct.Struct("!BBHII")  # V/P/X/CC, M/PT, seq, timestamp, ssrc


def build_packet(
    payload: bytes, seq: int, timestamp: int, ssrc: int, payload_type: int,
    marker: bool = False,
) -> bytes:
    b0 = RTP_VERSION << 6
    b1 = (0x80 if marker else 0) | (payload_type & 0x7F)
    return _HDR.pack(b0, b1, seq & 0xFFFF, timestamp & 0xFFFFFFFF, ssrc) + payload


def parse_packet(raw: bytes) -> dict:
    b0, b1, seq, ts, ssrc = _HDR.unpack_from(raw)
    assert (b0 >> 6) == RTP_VERSION, "not RTP v2"
    cc = b0 & 0xF
    offset = _HDR.size + 4 * cc
    return {
        "payload_type": b1 & 0x7F,
        "marker": bool(b1 & 0x80),
        "seq": seq,
        "timestamp": ts,
        "ssrc": ssrc,
        "payload": raw[offset:],
    }


class RtpAudioSender:
    """L16 (big-endian int16 PCM) RTP sender (audionetsink RTP mode)."""

    def __init__(self, address: str, port: int, stereo: bool = False,
                 samples_per_packet: int = 480):
        self.addr = (address, port)
        self.stereo = stereo
        self.spp = samples_per_packet
        self.seq = secrets.randbelow(1 << 16)
        self.timestamp = secrets.randbelow(1 << 32)
        self.ssrc = secrets.randbelow(1 << 32)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._pending = np.zeros((0, 2) if stereo else (0,), dtype=np.int16)

    def write(self, audio: np.ndarray) -> int:
        """audio: float in [-1,1) (T,) mono or (T,2) stereo."""
        pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        self._pending = np.concatenate([self._pending, pcm])
        sent = 0
        pt = PT_L16_STEREO if self.stereo else PT_L16_MONO
        while len(self._pending) >= self.spp:
            chunk, self._pending = self._pending[: self.spp], self._pending[self.spp :]
            payload = chunk.astype(">i2").tobytes()
            pkt = build_packet(payload, self.seq, self.timestamp, self.ssrc, pt)
            self._sock.sendto(pkt, self.addr)
            self.seq = (self.seq + 1) & 0xFFFF
            self.timestamp = (self.timestamp + self.spp) & 0xFFFFFFFF
            sent += 1
        return sent

    def close(self):
        self._sock.close()


class RtpAudioReceiver:
    def __init__(self, address: str, port: int, timeout: float = 2.0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((address, port))
        self._sock.settimeout(timeout)

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def read_packet(self) -> tuple[dict, np.ndarray]:
        raw, _ = self._sock.recvfrom(65536)
        info = parse_packet(raw)
        pcm = np.frombuffer(info["payload"], dtype=">i2").astype(np.float32) / 32768.0
        if info["payload_type"] == PT_L16_STEREO:
            pcm = pcm.reshape(-1, 2)
        return info, pcm

    def close(self):
        self._sock.close()
