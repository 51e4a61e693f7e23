"""RDS symbol/bit/frame layer + parser (host side, 1187.5 baud).

Reference: plugins/channelrx/demodbfm/rdsdemod.cpp (clock recovery + biphase
integrate-and-dump + differential decode), rdsdecoder.cpp (26-bit block sync
via syndrome of the RDS shortened cyclic code, offset words A/B/C/C'/D),
rdsparser.cpp (group types; PI/PTY/TP, PS name 0A/0B, RadioText 2A/2B).

Input: the complex RDS baseband the BFM channel emits at 8 samples/symbol
(coherently downconverted from 57 kHz). At 1187.5 baud this layer costs
microseconds in NumPy — the TPU does the MS/s part.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Generator polynomial g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1 (RDS standard).
_POLY = 0x5B9
# Offset words A, B, C, C', D (rdsdecoder.cpp offset_word table).
OFFSET_WORDS = {"A": 0x0FC, "B": 0x198, "C": 0x168, "C'": 0x350, "D": 0x1B4}
_OFFSET_ORDER = ["A", "B", "C", "D"]

PTY_NAMES = [
    "None", "News", "Current affairs", "Information", "Sport", "Education",
    "Drama", "Culture", "Science", "Varied", "Pop music", "Rock music",
    "Easy listening", "Light classical", "Serious classical", "Other music",
    "Weather", "Finance", "Children's", "Social affairs", "Religion",
    "Phone-in", "Travel", "Leisure", "Jazz music", "Country music",
    "National music", "Oldies music", "Folk music", "Documentary",
    "Alarm test", "Alarm",
]


def calc_syndrome(block: int, nbits: int) -> int:
    """Remainder of the block by the 11-bit generator (rdsdecoder.cpp
    calc_syndrome): plain polynomial long division."""
    reg = 0
    for i in range(nbits - 1, -1, -1):
        reg = (reg << 1) | ((block >> i) & 1)
        if reg & (1 << 10):
            reg ^= _POLY
    return reg & 0x3FF


#: Expected syndrome per offset (syndrome of a valid codeword is 0, so the
#: received syndrome equals the syndrome of the offset word alone).
SYNDROMES = {name: calc_syndrome(w, 26) for name, w in OFFSET_WORDS.items()}

#: syndrome delta of a single flipped bit i (linearity: syn(x ^ e_i) =
#: syn(x) ^ _BIT_SYNDROMES[i]) — enables 1-bit correction per block
_BIT_SYNDROMES = [calc_syndrome(1 << i, 26) for i in range(26)]


def correct_block(block: int, expected_syndrome: int) -> int | None:
    """Return the corrected 26-bit block if it is clean or has exactly one
    bit error; None otherwise (the reference relies on the code's burst
    correction; single-bit covers the dominant AWGN error mode)."""
    delta = calc_syndrome(block, 26) ^ expected_syndrome
    if delta == 0:
        return block
    for i in range(26):
        if _BIT_SYNDROMES[i] == delta:
            return block ^ (1 << i)
    return None


def crc10(dataword: int) -> int:
    """10-bit checkword of a 16-bit information word (shifted by x^10)."""
    return calc_syndrome(dataword << 10, 26)


def encode_block(dataword: int, offset: str) -> int:
    return (dataword << 10) | (crc10(dataword) ^ OFFSET_WORDS[offset])


def encode_group(blocks: list[int]) -> np.ndarray:
    """4×16-bit info words -> 104 bits with offsets A,B,C,D."""
    bits = []
    for word, off in zip(blocks, _OFFSET_ORDER):
        b = encode_block(word, off)
        bits.extend((b >> i) & 1 for i in range(25, -1, -1))
    return np.asarray(bits, dtype=np.uint8)


def bits_to_waveform(bits: np.ndarray, sps: int = 8) -> np.ndarray:
    """Differential-encode + biphase(Manchester) shape at sps samples/symbol
    (the inverse of the demod below; used by tests/goldens)."""
    diff = np.zeros(len(bits), dtype=np.uint8)
    prev = 0
    for i, b in enumerate(bits):
        prev = prev ^ int(b)
        diff[i] = prev
    half = sps // 2
    sym = np.concatenate([np.ones(half), -np.ones(half)])
    out = np.concatenate([(1.0 if d else -1.0) * sym for d in diff])
    return out.astype(np.float32)


@dataclasses.dataclass
class RDSStatus:
    pi: int | None = None
    pty: int | None = None
    tp: bool | None = None
    ps_name: str = "        "
    radiotext: str = " " * 64
    clock_time: str = ""  # "YYYY-MM-DD HH:MM+TZ" from group 4A
    groups_ok: int = 0
    blocks_with_errors: int = 0
    blocks_corrected: int = 0

    @property
    def pty_name(self) -> str:
        return PTY_NAMES[self.pty] if self.pty is not None else ""


class RDSDecoder:
    """Streaming symbol→bit→group pipeline with carried state."""

    def __init__(self, sps: int = 8):
        self.sps = sps
        self._carry = np.zeros(0, dtype=np.float64)
        self._prev_raw = 0
        self._bit_reg = 0
        self._bits_seen = 0
        self._synced = False
        self._block_idx = 0
        self._group: list[int] = []
        self.status = RDSStatus()
        self._ps = list(" " * 8)
        self._rt = list(" " * 64)

    # -- symbol layer ------------------------------------------------------

    def feed_baseband(self, bb: np.ndarray) -> list[list[int]]:
        """bb: complex RDS baseband at sps×1187.5 Hz. Returns completed,
        CRC-clean groups as lists of 4 info words.

        Symbol timing: the phase is estimated once from the first block's
        matched-filter metric and held (the emitting resampler is rationally
        locked to the symbol rate, so there is no drift to track; a slow
        tracking loop would slot in here for free-running sources).
        """
        x = np.real(np.asarray(bb)).astype(np.float64)
        x = np.concatenate([self._carry, x])
        sps = self.sps
        half = sps // 2
        m = np.concatenate([np.ones(half), -np.ones(half)])

        if not hasattr(self, "_timing_locked"):
            if len(x) < 64 * sps:  # need enough signal to estimate timing
                self._carry = x
                return []
            n_try = len(x) // sps - 1
            best_phase, best_metric = 0, -1.0
            for ph in range(sps):
                seg = x[ph : ph + n_try * sps].reshape(n_try, sps)
                metric = np.abs(seg @ m).mean()
                if metric > best_metric:
                    best_metric, best_phase = metric, ph
            self._timing_locked = True
            x = x[best_phase:]  # symbol-align the stream once

        n_sym = len(x) // sps
        self._carry = x[n_sym * sps :]
        if n_sym == 0:
            return []
        acc = x[: n_sym * sps].reshape(n_sym, sps) @ m
        raw = (acc > 0).astype(np.uint8)
        groups = []
        for rb in raw:
            bit = int(rb) ^ self._prev_raw  # differential decode
            self._prev_raw = int(rb)
            g = self._feed_bit(bit)
            if g is not None:
                groups.append(g)
                self.parse_group(g)
        return groups

    # -- frame layer (rdsdecoder.cpp frameSync semantics) ------------------

    def _feed_bit(self, bit: int):
        self._bit_reg = ((self._bit_reg << 1) | bit) & ((1 << 26) - 1)
        self._bits_seen += 1
        if not self._synced:
            if self._bits_seen >= 26 and calc_syndrome(self._bit_reg, 26) == SYNDROMES["A"]:
                # current register is a clean block-A: start of a group
                self._synced = True
                self._group = [self._bit_reg >> 10]
                self._block_idx = 1  # next expected offset: B
                self._bits_since_block = 0
            return None
        self._bits_since_block += 1
        if self._bits_since_block < 26:
            return None
        self._bits_since_block = 0
        expected = _OFFSET_ORDER[self._block_idx]
        corrected = correct_block(self._bit_reg, SYNDROMES[expected])
        if corrected is None and expected == "C":
            corrected = correct_block(self._bit_reg, SYNDROMES["C'"])
        if corrected is None:
            # uncorrectable: drop sync and re-acquire (rdsdecoder.cpp)
            self.status.blocks_with_errors += 1
            self._synced = False
            self._group = []
            self._bits_seen = 0
            return None
        if corrected != self._bit_reg:
            self.status.blocks_corrected += 1
        self._group.append(corrected >> 10)
        self._block_idx += 1
        if self._block_idx == 4:
            g, self._group = self._group, []
            self._block_idx = 0
            self.status.groups_ok += 1
            return g
        return None

    # -- parser (rdsparser.cpp subset: 0A/0B PS, 2A/2B RT) -----------------

    def parse_group(self, g: list[int]) -> None:
        st = self.status
        st.pi = g[0]
        gtype = (g[1] >> 12) & 0xF
        version_b = (g[1] >> 11) & 1
        st.tp = bool((g[1] >> 10) & 1)
        st.pty = (g[1] >> 5) & 0x1F
        if gtype == 0:
            seg = g[1] & 0x3
            chars = g[3]
            self._ps[2 * seg] = chr((chars >> 8) & 0xFF)
            self._ps[2 * seg + 1] = chr(chars & 0xFF)
            st.ps_name = "".join(self._ps)
        elif gtype == 4 and not version_b:
            # 4A clock-time: Modified Julian Date + hour/minute + offset
            mjd = ((g[1] & 0x3) << 15) | (g[2] >> 1)
            hour = ((g[2] & 1) << 4) | (g[3] >> 12)
            minute = (g[3] >> 6) & 0x3F
            offs_sign = -1 if (g[3] >> 5) & 1 else 1
            offs_half_hours = g[3] & 0x1F
            # MJD -> calendar (standard RDS conversion)
            yp = int((mjd - 15078.2) / 365.25)
            mp = int((mjd - 14956.1 - int(yp * 365.25)) / 30.6001)
            day = mjd - 14956 - int(yp * 365.25) - int(mp * 30.6001)
            k = 1 if mp in (14, 15) else 0
            year = 1900 + yp + k
            month = mp - 1 - k * 12
            tz = offs_sign * offs_half_hours * 0.5
            st.clock_time = (
                f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}"
                f"{'+' if tz >= 0 else '-'}{abs(tz):g}h"
            )
        elif gtype == 2:
            seg = g[1] & 0xF
            if version_b:
                chars = [(g[3] >> 8) & 0xFF, g[3] & 0xFF]
                base = 2 * seg
            else:
                chars = [
                    (g[2] >> 8) & 0xFF, g[2] & 0xFF,
                    (g[3] >> 8) & 0xFF, g[3] & 0xFF,
                ]
                base = 4 * seg
            for i, c in enumerate(chars):
                if base + i < 64:
                    self._rt[base + i] = chr(c)
            st.radiotext = "".join(self._rt)
