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


def get_demod(uri: str) -> ChannelKind:
    return REGISTRY[uri]


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
