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
    block_factor: Callable[[float], int] | None = None  # extra divisibility
    # requirement of the channel-rate block (beyond the generic audio ratio)


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
    "inputFrequencyOffset", "audioFile", "audioUdp", "audioRtp", "toneFrequency",
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


register(ChannelKind("sdrangel.channel.nfmdemod", demod_nfm.NFMConfig,
                     demod_nfm.make_state, demod_nfm.process))
register(ChannelKind("sdrangel.channel.amdemod", demod_am.AMConfig,
                     demod_am.make_state, demod_am.process))
register(ChannelKind("sdrangel.channel.ssbdemod", demod_ssb.SSBConfig,
                     demod_ssb.make_state, demod_ssb.process, needs_fft_hop=True))
register(ChannelKind("sdrangel.channel.wfmdemod", demod_wfm.WFMConfig,
                     demod_wfm.make_state, demod_wfm.process, needs_fft_hop=True))
def _bfm_process_engine(state, x, cfg, offset_hz=None):
    """Engine adapter: BFM emits rich outputs; the engine consumes audio.
    (RDS consumers use demod_bfm.process directly for the full outputs.)"""
    state, outs = demod_bfm.process(state, x, cfg)
    return state, outs.audio


def _bfm_block_factor(channel_rate: float) -> int:
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
                     needs_fft_hop=True, block_factor=_bfm_block_factor))
