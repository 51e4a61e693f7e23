"""DSD front end — 4-level FSK digital-voice symbol recovery.

Reference: plugins/channelrx/demoddsd/dsddemod.cpp (`feed`): NCO mix →
resample to 48 kHz → FM discriminator × demodGain → squelch gate + delay
line → per-sample feed of the external DSDcc `DSDDecoder` (DMR/D-Star/YSF
frame decoding + AMBE vocoding via mbelib/serial dongle).

The vocoder and trunking protocol stacks are external hardware/library territory
(SURVEY §2.3 marks them out of scope); this module provides everything up
to and including the symbol layer the decoder consumes: discriminator
baseband at 48 kHz, Gardner-tracked symbol instants at 4800 baud, and
4-level slicing into dibits — the exact input DSDcc's frame sync expects.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dsp import firdesign, movingavg, nco, phasediscri, resampler, squelch, symsync


@dataclasses.dataclass(frozen=True, eq=False)
class DSDConfig:
    channel_rate: float
    input_offset: float = 0.0
    audio_rate: float = 48000.0  # discriminator rate (DSDcc works at 48k)
    rf_bandwidth: float = 12500.0
    fm_deviation: float = 3500.0  # ±3.5 kHz outer symbol (DMR/ YSF class)
    symbol_rate: float = 4800.0
    squelch_db: float = -60.0
    block_in: int = 0

    @property
    def sps(self) -> int:
        return int(self.audio_rate / self.symbol_rate)  # 10 at 48k/4800

    @functools.cached_property
    def resampler_plan(self) -> resampler.ResamplerPlan:
        from .demod_nfm import _auto_block

        block = self.block_in or _auto_block(self.channel_rate, self.audio_rate)
        plan = resampler.make_plan(
            self.channel_rate, self.audio_rate, block, cutoff=self.rf_bandwidth / 2.2  # dsddemod.cpp:451
        )
        # the symbol synchronizer needs the audio block to be a whole number
        # of symbols
        import math

        mult = self.sps // math.gcd(plan.block_out, self.sps)
        if mult > 1:
            plan = resampler.make_plan(
                self.channel_rate, self.audio_rate, block * mult,
                cutoff=self.rf_bandwidth / 2.2  # dsddemod.cpp:451,
            )
        return plan

    @functools.cached_property
    def shaping_taps(self) -> np.ndarray:
        # symbol-rate lowpass ahead of the slicer (the reference's RRC role)
        return firdesign.lowpass(81, 0.75 * self.symbol_rate / self.audio_rate)

    @property
    def fm_scaling(self) -> float:
        # outer symbol (±3·sub-deviation) maps to ±1.0 like the reference's
        # demodGain normalization
        return self.audio_rate / (2.0 * self.fm_deviation)


class DSDState(NamedTuple):
    nco: nco.NCOState
    resamp: resampler.ResamplerState
    discri: phasediscri.DiscriminatorState
    mavg: movingavg.MovingAvgState
    squelch: squelch.SquelchState
    shaping: firdesign.FirState
    sym: symsync.SymSyncState


_SQUELCH_GATE = 480


def make_state(cfg: DSDConfig, batch_shape=()) -> DSDState:
    return DSDState(
        nco=nco.make_nco(batch_shape),
        resamp=resampler.init_state(cfg.resampler_plan, batch_shape),
        discri=phasediscri.make_state(batch_shape),
        mavg=movingavg.make_state(32, batch_shape),
        squelch=squelch.make_state(_SQUELCH_GATE, batch_shape),
        shaping=firdesign.make_state(81, batch_shape),
        sym=symsync.make_state(batch_shape, sps=cfg.sps),
    )


class DSDOutputs(NamedTuple):
    dibits: jnp.ndarray  # (..., n_sym) int32 in {0,1,2,3} (DSDcc convention)
    soft_symbols: jnp.ndarray  # (..., n_sym) float32 discriminator levels
    squelch_open: jnp.ndarray  # (...,) bool


def process(state: DSDState, x: jnp.ndarray, cfg: DSDConfig) -> tuple[DSDState, DSDOutputs]:
    inc = jnp.asarray(nco.freq_to_increment(-cfg.input_offset, cfg.channel_rate))
    nco_state, xm = nco.mix_block(state.nco, x, inc)
    resamp_state, ci = resampler.resample_block(state.resamp, xm, cfg.resampler_plan)

    discri_state, demod, magsq = phasediscri.discriminator_delta(
        state.discri, ci, cfg.fm_scaling
    )
    mavg_state, avg = movingavg.moving_average(state.mavg, magsq)
    open_cond = avg >= 10.0 ** (cfg.squelch_db / 10.0)
    squelch_state, gated, is_open = squelch.gate_block(
        state.squelch, demod, open_cond, _SQUELCH_GATE
    )

    shaping_state, shaped = firdesign.fir_apply(
        state.shaping, gated, jnp.asarray(cfg.shaping_taps)
    )
    sym_state, symbols = symsync.synchronize_block(
        state.sym, shaped.astype(jnp.complex64), cfg.sps
    )
    soft = jnp.real(symbols)
    # 4-level slicer: thresholds at 0 and ±2/3 of outer level
    # (DSDcc dibit mapping: +3 -> 0b01, +1 -> 0b00, -1 -> 0b10, -3 -> 0b11)
    outer = jnp.maximum(
        jnp.mean(jnp.abs(soft), axis=-1, keepdims=True) * 1.5, 1e-6
    )
    level = soft / outer
    dibits = jnp.where(
        level > 2.0 / 3.0, 1,
        jnp.where(level > 0.0, 0, jnp.where(level > -2.0 / 3.0, 2, 3)),
    ).astype(jnp.int32)

    new_state = DSDState(
        nco=nco_state, resamp=resamp_state, discri=discri_state,
        mavg=mavg_state, squelch=squelch_state, shaping=shaping_state,
        sym=sym_state,
    )
    return new_state, DSDOutputs(dibits, soft.astype(jnp.float32), is_open[..., -1])
