"""SDRdaemon-style UDP superframe transport with FEC — the distributed
I/Q data plane.

Reference: plugins/samplesource/sdrdaemonsource/sdrdaemonsourcebuffer.h:27-85
— superframes of 128 data blocks + nbFECBlocks parity (512-byte payloads),
block 0 carrying MetaDataFEC {centerFrequency, sampleRate, sampleBits,
nbBlocks, nbFECBlocks, crc32}; the receiver keeps decoder slots per frame,
recovers lost blocks with CM256, and tracks recovery statistics
(:100-115). This implementation keeps the same superframe structure over
plain sockets with sdrangel_tpu.io.fec as the erasure code.
"""

from __future__ import annotations

import dataclasses
import socket
import struct
import zlib

import numpy as np

from . import fec

BLOCK_BYTES = 512  # payload per UDP block (sdrdaemonsourcebuffer.h)
DATA_BLOCKS = 128  # original blocks per superframe
_HDR = struct.Struct("<IHH")  # frame_index, block_index, n_fec
_META = struct.Struct("<QIIHHII")  # cf, rate, bits, nbBlocks, nbFEC, length, crc32


@dataclasses.dataclass
class FrameStats:
    frames_ok: int = 0
    frames_failed: int = 0
    blocks_received: int = 0
    blocks_recovered: int = 0


def make_superframe(
    frame_index: int,
    payload: bytes,
    n_fec: int,
    center_frequency: int = 0,
    sample_rate: int = 0,
    sample_bits: int = 16,
) -> list[bytes]:
    """Split payload into DATA_BLOCKS blocks (block 0 = metadata), append
    n_fec parity blocks; returns the UDP datagrams (header + 512B payload)."""
    meta = _META.pack(
        center_frequency, sample_rate, sample_bits, DATA_BLOCKS, n_fec,
        len(payload), zlib.crc32(payload),
    )
    meta = meta + b"\x00" * (BLOCK_BYTES - len(meta))
    room = (DATA_BLOCKS - 1) * BLOCK_BYTES
    assert len(payload) <= room, (len(payload), room)
    padded = payload + b"\x00" * (room - len(payload))
    blocks = [meta] + [
        padded[i * BLOCK_BYTES : (i + 1) * BLOCK_BYTES] for i in range(DATA_BLOCKS - 1)
    ]
    arr = np.frombuffer(b"".join(blocks), dtype=np.uint8).reshape(DATA_BLOCKS, BLOCK_BYTES)
    parity = fec.fec_encode(arr, n_fec) if n_fec else np.zeros((0, BLOCK_BYTES), np.uint8)
    grams = []
    for i in range(DATA_BLOCKS):
        grams.append(_HDR.pack(frame_index, i, n_fec) + blocks[i])
    for j in range(n_fec):
        grams.append(_HDR.pack(frame_index, DATA_BLOCKS + j, n_fec) + parity[j].tobytes())
    return grams


class SuperframeAssembler:
    """Receiver side: per-frame decoder slots + FEC recovery + stats."""

    def __init__(self):
        self.slots: dict[int, dict[int, np.ndarray]] = {}
        self.stats = FrameStats()

    def feed(self, datagram: bytes):
        """Returns (frame_index, payload, meta dict) when a frame completes,
        else None."""
        fi, bi, n_fec = _HDR.unpack_from(datagram)
        block = np.frombuffer(datagram[_HDR.size :], dtype=np.uint8)
        if len(block) != BLOCK_BYTES:
            return None
        slot = self.slots.setdefault(fi, {})
        slot[bi] = block
        self.stats.blocks_received += 1
        if len(slot) < DATA_BLOCKS:
            return None
        data = fec.fec_decode(slot, DATA_BLOCKS, BLOCK_BYTES)
        del self.slots[fi]
        if data is None:
            self.stats.frames_failed += 1
            return None
        n_data_present = sum(1 for i in slot if i < DATA_BLOCKS)
        self.stats.blocks_recovered += DATA_BLOCKS - n_data_present
        meta_raw = data[0].tobytes()
        cf, rate, bits, nb, nfec, length, crc = _META.unpack_from(meta_raw)
        payload = data[1:].tobytes()[:length]
        if zlib.crc32(payload) != crc:  # integrity check (MetaDataFEC crc32)
            self.stats.frames_failed += 1
            return None
        self.stats.frames_ok += 1
        # bound decoder slots (jitter window): drop stale frames
        if len(self.slots) > 8:
            for old in sorted(self.slots)[:-4]:
                del self.slots[old]
        meta = {
            "center_frequency": cf, "sample_rate": rate, "sample_bits": bits,
            "nb_blocks": nb, "nb_fec": nfec, "length": length, "crc32": crc,
        }
        return fi, payload, meta


class DaemonSender:
    """UDP sender streaming I/Q superframes (the sdrdaemonsink role)."""

    def __init__(self, address: str, port: int, n_fec: int = 8,
                 center_frequency: int = 0, sample_rate: int = 0):
        self.addr = (address, port)
        self.n_fec = n_fec
        self.cf = center_frequency
        self.rate = sample_rate
        self.frame_index = 0
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    @property
    def payload_room(self) -> int:
        return (DATA_BLOCKS - 1) * BLOCK_BYTES

    def send_iq(self, iq_int16: np.ndarray) -> int:
        """Send (N,2) int16 I/Q; N*4 bytes must fit one superframe."""
        payload = iq_int16.astype("<i2").tobytes()
        grams = make_superframe(
            self.frame_index, payload, self.n_fec, self.cf, self.rate
        )
        for g in grams:
            self._sock.sendto(g, self.addr)
        self.frame_index += 1
        return len(grams)

    def close(self):
        self._sock.close()


class DaemonReceiver:
    """UDP receiver (the sdrdaemonsource role)."""

    def __init__(self, address: str, port: int, timeout: float = 2.0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((address, port))
        self._sock.settimeout(timeout)
        self.assembler = SuperframeAssembler()

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def recv_frame(self):
        """Block until one full superframe decodes; returns (iq_int16, meta)."""
        while True:
            gram, _ = self._sock.recvfrom(2048)
            out = self.assembler.feed(gram)
            if out is not None:
                fi, payload, meta = out
                iq = np.frombuffer(payload, dtype="<i2").reshape(-1, 2)
                return iq, meta

    def close(self):
        self._sock.close()
