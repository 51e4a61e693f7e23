"""Channel-type registry — the plugin-manager equivalent.

Reference: sdrbase/plugin/pluginmanager.{h,cpp} loads Qt plugin .so files and
registers Rx/Tx channel factories keyed by URI (e.g.
"sdrangel.channel.nfmdemod"). Here the registry is a plain dict of
(config_cls, make_state, process) triples keyed by the same URIs, extensible
by user code at import time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from . import demod_am, demod_bfm, demod_nfm, demod_ssb, demod_wfm


@dataclasses.dataclass(frozen=True)
class ChannelKind:
    uri: str
    config_cls: type
    make_state: Callable[..., Any]
    process: Callable[..., Any]
    direction: str = "rx"
    needs_fft_hop: bool = False  # demod uses fftfilt -> block must divide its hop
    block_factor: Callable[[float, dict], int] | None = None  # extra
    # divisibility requirement of the channel-rate block, given the
    # channel rate AND the user's settings (beyond the generic audio ratio)
    output: str = "audio"  # "audio" (48 kHz demod) | "data" (symbols/video/iq)
    needs_audio_ratio: bool = True  # block must make the 48 kHz ratio integral
    adapter: Callable[[Any], dict] | None = None  # data kinds: Outputs
    # NamedTuple -> {name: real-valued jnp array} (complex split on device so
    # transfers stay float — see .claude/skills/verify/SKILL.md)
    dynamic_fields: frozenset = frozenset()  # process kwargs threadable as
    # traced args ("offset_hz"/"squelch_db"/"volume"): live settings changes
    # to the matching knobs apply without recompiling (the reference's
    # applySettings-on-a-running-channel path, nfmdemod.cpp handleMessage)
    meters: Callable[[Any, Any, dict], dict] | None = None  # (new_state,
    # cfg, dyn) -> report meters computed from the kernel's own state (e.g.
    # the squelch gate, nfmdemod.h:153-170 getters)
    data_keys: tuple = ()  # data kinds: the adapter's output array names
    # (documented in the per-kind report schema; asserted against the
    # adapter in tests/test_openapi.py)
    host_report_keys: tuple = ()  # extra host-side report sections (e.g.
    # "datv" stats, "dsd" frame-sync report)


REGISTRY: dict[str, ChannelKind] = {}


def register(kind: ChannelKind) -> None:
    REGISTRY[kind.uri] = kind
    CONFIG_CLASSES[kind.uri] = kind.config_cls


def get_demod(uri: str) -> ChannelKind:
    return REGISTRY[uri]


#: config fields bound by the pipeline (not user-settable over the API)
_PIPELINE_FIELDS = {"channel_rate", "input_offset", "block_in", "block_af"}
#: session-level per-channel keys handled outside the demod/mod config
#: (offset → channel plan; audioFile/audioUdp/audioRtp → audio egress;
#: toneFrequency → Tx AF source)
SESSION_KEYS = {
    "inputFrequencyOffset", "audioFile", "audioUdp", "audioRtp",
    "toneFrequency", "afUdp", "afFile", "cwText", "cwWpm", "datvContinuous",
    # udpsrc egress: destination + wire format (io.udp FORMATS)
    "udpAddress", "udpPort", "udpFormat",
}

#: uri -> config dataclass for schema purposes; Rx kinds land here via
#: register(), Tx modulator kinds via register_config() (runtime/tx.py)
CONFIG_CLASSES: dict[str, type] = {}


def register_config(uri: str, config_cls: type) -> None:
    CONFIG_CLASSES[uri] = config_cls


def settings_schema(uri: str) -> dict[str, dict]:
    """The channel type's settable fields: name -> {type, default}.

    The reference publishes per-plugin settings DTOs through swagger
    (swagger/sdrangel/api/swagger/include/*.yaml); here the schema is
    derived from the config dataclass so it can never drift from the code.
    """
    schema: dict[str, dict] = {}
    for f in dataclasses.fields(CONFIG_CLASSES[uri]):
        if f.name in _PIPELINE_FIELDS:
            continue
        default = None if f.default is dataclasses.MISSING else f.default
        schema[f.name] = {
            "type": getattr(f.type, "__name__", str(f.type)),
            "default": default,
        }
    return schema


def requested_rate(uri: str, settings: dict) -> float:
    """The bandwidth a channel asks of the channelizer (the reference's
    demods request their audio/RF width through DSPConfigureChannelizer).
    Audio demods want the 48 kHz class; data channels derive theirs from
    their own signal parameters."""
    if uri == "sdrangel.channel.demoddatv":
        # integer samples-per-symbol at 4 sps
        return 4.0 * float(settings.get("symbol_rate", 250_000.0))
    if uri == "sdrangel.channel.demodatv":
        return float(settings.get("rf_bandwidth", 6_000_000.0))
    if uri == "sdrangel.channel.lorademod":
        return 2.0 * float(settings.get("bandwidth", 125_000.0))
    if uri == "sdrangel.channel.chanalyzer":
        return max(48_000.0, 2.5 * float(settings.get("bandwidth", 5000.0)))
    if uri == "sdrangel.channel.bfm":
        # the full MPX (pilot/stereo/RDS up to 57 kHz + FM deviation) must
        # survive channelization (bfmdemod.cpp rfBandwidth default 180k)
        return float(settings.get("rf_bandwidth", 180_000.0))
    return 48_000.0


def validate_settings(uri: str, settings: dict) -> None:
    """Reject unknown setting keys up front (ValueError) instead of failing
    later inside the engine thread at pipeline-build time."""
    if uri not in CONFIG_CLASSES:
        raise ValueError(f"unknown channel type {uri!r}")
    allowed = set(settings_schema(uri)) | SESSION_KEYS
    unknown = set(settings) - allowed
    if unknown:
        raise ValueError(
            f"unknown settings for {uri}: {sorted(unknown)}; "
            f"allowed: {sorted(allowed)}"
        )


_FULL_DYN = frozenset({"offset_hz", "squelch_db", "volume"})

register(ChannelKind("sdrangel.channel.nfmdemod", demod_nfm.NFMConfig,
                     demod_nfm.make_state, demod_nfm.process,
                     dynamic_fields=_FULL_DYN, meters=demod_nfm.meters))
register(ChannelKind("sdrangel.channel.amdemod", demod_am.AMConfig,
                     demod_am.make_state, demod_am.process,
                     dynamic_fields=_FULL_DYN, meters=demod_am.meters))
register(ChannelKind("sdrangel.channel.ssbdemod", demod_ssb.SSBConfig,
                     demod_ssb.make_state, demod_ssb.process, needs_fft_hop=True,
                     dynamic_fields=frozenset({"offset_hz", "volume"})))
register(ChannelKind("sdrangel.channel.wfmdemod", demod_wfm.WFMConfig,
                     demod_wfm.make_state, demod_wfm.process, needs_fft_hop=True,
                     dynamic_fields=_FULL_DYN, meters=demod_wfm.meters))
def _bfm_process_engine(state, x, cfg, **dyn):
    """Engine adapter: BFM emits rich outputs; the engine consumes audio.
    (RDS consumers use demod_bfm.process directly for the full outputs.)"""
    state, outs = demod_bfm.process(state, x, cfg, **dyn)
    return state, outs.audio


def _bfm_block_factor(channel_rate: float, settings: dict) -> int:
    """BFM's internal resamplers need the block divisible by the mono AND
    RDS (9500 Hz) rational numerators (demod_bfm.BFMConfig.mono_plan)."""
    import math
    from fractions import Fraction

    p_mono = Fraction(channel_rate / 48000.0).limit_denominator(1 << 20).numerator
    p_rds = Fraction(
        channel_rate / (demod_bfm.RDS_SYMBOL_RATE * demod_bfm.RDS_SPS)
    ).limit_denominator(1 << 20).numerator
    return math.lcm(p_mono, p_rds, 512)


register(ChannelKind("sdrangel.channel.bfm", demod_bfm.BFMConfig,
                     demod_bfm.make_state, _bfm_process_engine,
                     needs_fft_hop=True, block_factor=_bfm_block_factor,
                     dynamic_fields=_FULL_DYN, meters=demod_bfm.meters))


# -- data channels (non-audio outputs; reference plugins chanalyzer,
# demodlora, demoddsd, demodatv, demoddatv) ---------------------------------

def _split_complex(z):
    import jax.numpy as jnp

    return {"real": jnp.real(z).astype(jnp.float32),
            "imag": jnp.imag(z).astype(jnp.float32)}


def _chanalyzer_adapter(outs) -> dict:
    iq = _split_complex(outs.iq)
    return {"iq_real": iq["real"], "iq_imag": iq["imag"],
            "spectrum": outs.spectrum, "channelPowerDB": outs.channel_power_db}


def _lora_adapter(outs) -> dict:
    return {"symbols": outs.symbols, "magnitudes": outs.magnitudes,
            "snr_est": outs.snr_est}


def _dsd_adapter(outs) -> dict:
    import jax.numpy as jnp

    return {"dibits": outs.dibits, "soft_symbols": outs.soft_symbols,
            "squelch_open": outs.squelch_open.astype(jnp.int32)}


def _atv_adapter(outs) -> dict:
    return {"lines": outs.lines, "sync_phase": outs.sync_phase,
            "sync_quality": outs.sync_quality}


def _datv_adapter(outs) -> dict:
    return {"soft_i": outs.soft_i, "soft_q": outs.soft_q}


def _lora_block_factor(channel_rate: float, settings: dict) -> int:
    from . import demod_lora

    return demod_lora.LoRaConfig(
        channel_rate=channel_rate,
        bandwidth=float(settings.get("bandwidth", 125_000.0)),
        spread_factor=int(settings.get("spread_factor", 7)),
    ).block_factor()


def _dsd_block_factor(channel_rate: float, settings: dict) -> int:
    # audio-rate stream must split into whole symbols (sps = 48000/4800)
    import math
    from fractions import Fraction

    frac = Fraction(channel_rate / 48000.0).limit_denominator(1 << 20)
    p = frac.numerator
    # block·q/p audio samples divisible by 10 -> block multiple of 10p/gcd(q,10)
    return 10 * p // math.gcd(frac.denominator, 10)


def _atv_block_factor(channel_rate: float, settings: dict) -> int:
    # whole lines per block keep the line grid block-aligned (PAL 15625 Hz)
    from . import demod_atv

    return demod_atv.ATVConfig(
        channel_rate=channel_rate,
        standard=str(settings.get("standard", "pal625")),
        lines=int(settings.get("lines", 0)),
        fps=float(settings.get("fps", 0.0)),
    ).samples_per_line


def _datv_block_factor(channel_rate: float, settings: dict) -> int:
    from . import demod_datv

    return demod_datv.DATVConfig(
        channel_rate=channel_rate,
        symbol_rate=float(settings.get("symbol_rate", 250_000.0)),
    ).sps


def _register_data_kinds() -> None:
    from . import chanalyzer, demod_atv, demod_datv, demod_dsd, demod_lora

    register(ChannelKind(
        "sdrangel.channel.chanalyzer", chanalyzer.ChanAnalyzerConfig,
        chanalyzer.make_state, chanalyzer.process, needs_fft_hop=True,
        output="data", needs_audio_ratio=False, adapter=_chanalyzer_adapter,
        data_keys=("iq_real", "iq_imag", "spectrum", "channelPowerDB")))
    register(ChannelKind(
        "sdrangel.channel.lorademod", demod_lora.LoRaConfig,
        demod_lora.make_state, demod_lora.process,
        block_factor=_lora_block_factor,
        output="data", needs_audio_ratio=False, adapter=_lora_adapter,
        data_keys=("symbols", "magnitudes", "snr_est")))
    register(ChannelKind(
        "sdrangel.channel.dsddemod", demod_dsd.DSDConfig,
        demod_dsd.make_state, demod_dsd.process,
        block_factor=_dsd_block_factor,
        output="data", needs_audio_ratio=True, adapter=_dsd_adapter,
        data_keys=("dibits", "soft_symbols", "squelch_open"),
        host_report_keys=("dsd",)))
    register(ChannelKind(
        "sdrangel.channel.demodatv", demod_atv.ATVConfig,
        demod_atv.make_state, demod_atv.process,
        block_factor=_atv_block_factor, needs_fft_hop=True,
        output="data", needs_audio_ratio=False, adapter=_atv_adapter,
        data_keys=("lines", "sync_phase", "sync_quality")))
    register(ChannelKind(
        "sdrangel.channel.demoddatv", demod_datv.DATVConfig,
        demod_datv.make_state, demod_datv.process,
        block_factor=_datv_block_factor, needs_fft_hop=True,
        output="data", needs_audio_ratio=False, adapter=_datv_adapter,
        data_keys=("soft_i", "soft_q"), host_report_keys=("datv",)))
    from . import udpsrc as _udpsrc

    register(ChannelKind(
        "sdrangel.channel.udpsrc", _udpsrc.UdpSrcConfig,
        _udpsrc.make_state, _udpsrc.process, needs_fft_hop=True,
        output="data", needs_audio_ratio=True, adapter=_udpsrc_adapter,
        data_keys=("iq_real", "iq_imag", "scalar", "squelch"),
        dynamic_fields=frozenset({"offset_hz", "squelch_db"})))


def _udpsrc_adapter(outs) -> dict:
    iq = _split_complex(outs.iq)
    return {"iq_real": iq["real"], "iq_imag": iq["imag"],
            "scalar": outs.scalar, "squelch": outs.squelch_open}


_register_data_kinds()


def report_schema(uri: str) -> dict:
    """Per-kind channel *report* schema (the role of the reference's
    per-plugin SWG*Report yamls, swagger/sdrangel/api/swagger/include/).
    Audio kinds report the standard meter set; data kinds add their
    adapter's array names and any host-side report sections."""
    base = {
        "channelPowerDB": {"type": "number"},
        "squelch": {"type": "boolean"},
        "audioSampleRate": {"type": "number"},
        "audioSamples": {"type": "integer"},
    }
    kind = REGISTRY.get(uri)
    if kind is None or kind.output != "data":
        return {"type": "object", "properties": base}
    props = dict(base)
    props["dataBlocks"] = {"type": "integer"}
    props["dataKeys"] = {
        "type": "array", "items": {"type": "string"},
        "enum": [list(kind.data_keys)],
    }
    for key in kind.host_report_keys:
        props[key] = {"type": "object"}
    return {"type": "object", "properties": props}
