"""Tx pipeline — the DSPDeviceSinkEngine equivalent.

Reference (SURVEY.md §3.5): device sink pulls; channels push through
UpChannelizer trees; DSPDeviceSinkEngine::work merges multiple channel
sources by summing and dividing by the channel count; FileRecord/filesink
records the device-rate stream as .sdriq. Block form: AF blocks → modulators
→ upchannelizer placement → sum/merge → device ×2^k interpolation → int16.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..channels import modulators as mods
from ..channels import registry
from ..dsp import channelizer as chan
from ..dsp import interpolators as interp


_MOD_KINDS = {
    "sdrangel.channeltx.modnfm": (mods.NFMModConfig, mods.make_fm_state, mods.fm_modulate),
    "sdrangel.channeltx.modam": (mods.AMModConfig, mods.make_am_state, mods.am_modulate),
    "sdrangel.channeltx.modssb": (mods.SSBModConfig, mods.make_ssb_state, mods.ssb_modulate),
    "sdrangel.channeltx.modwfm": (mods.WFMModConfig, mods.make_wfm_state, mods.wfm_modulate),
}

for _uri, (_cfg_cls, _, _) in _MOD_KINDS.items():
    registry.register_config(_uri, _cfg_cls)


@dataclasses.dataclass(frozen=True, eq=False)
class TxChannelSpec:
    uri: str
    frequency_offset: float
    settings: dict
    requested_rate: float = 48000.0


@dataclasses.dataclass(frozen=True, eq=False)
class TxDeviceConfig:
    sample_rate: float  # DAC rate
    log2_interp: int = 0
    center_frequency: float = 0.0

    @property
    def baseband_rate(self) -> float:
        return self.sample_rate / (1 << self.log2_interp)


class TxPipeline:
    """Fused per-block Tx step: list of AF blocks in, device-rate int16 out."""

    def __init__(
        self,
        device: TxDeviceConfig,
        channels: list[TxChannelSpec],
        block_af: int = 4096,
    ):
        self.device = device
        self.specs = channels
        self.block_af = block_af
        # reuse the Rx frequency-plan recursion for placement (the reference
        # UpChannelizer uses the same createFilterChain, upchannelizer.cpp)
        self.plans = [
            chan.plan_channel(device.baseband_rate, c.requested_rate, c.frequency_offset)
            for c in channels
        ]
        self.mod_cfgs = []
        self.mod_fns = []
        for spec, plan in zip(channels, self.plans):
            cfg_cls, make_state, modulate = _MOD_KINDS[spec.uri]
            cfg = cfg_cls(
                channel_rate=plan.channel_rate,
                input_offset=plan.residual_offset,
                block_af=block_af,
                **spec.settings,
            )
            self.mod_cfgs.append(cfg)
            self.mod_fns.append((make_state, modulate))

        # Channel-parallel grouping (ThreadedBasebandSampleSource role,
        # threadedbasebandsamplesource.h — one thread per Tx channel in the
        # reference; here channels with the same kind, settings, and stage
        # depth run as ONE batched modulate + upchannelize_bank, with the
        # per-channel residual offsets and rotation signs as data):
        # groups: list of (channel indices, cfg0, make/modulate, signs,
        # residuals). Singleton groups fall out naturally.
        groups: dict[tuple, list[int]] = {}
        for i, (spec, plan) in enumerate(zip(channels, self.plans)):
            key = (spec.uri, len(plan.signs),
                   tuple(sorted(spec.settings.items())))
            groups.setdefault(key, []).append(i)
        self.groups = []
        for key, idxs in groups.items():
            cfg0 = dataclasses.replace(self.mod_cfgs[idxs[0]], input_offset=0.0)
            signs = np.array([self.plans[i].signs for i in idxs], np.int64)
            residuals = np.asarray(
                [self.plans[i].residual_offset for i in idxs], np.float32)
            self.groups.append(
                (idxs, cfg0, self.mod_fns[idxs[0]], signs, residuals))
        self._step = jax.jit(self._step_impl)

    @property
    def device_block(self) -> int:
        """Device-rate samples produced per AF block."""
        ratio = self.mod_cfgs[0].up.block_out // self.block_af  # ch_rate/48k
        per_ch = self.block_af * ratio * self.plans[0].decimation
        return per_ch << self.device.log2_interp

    def init_state(self) -> dict:
        return jax.jit(self._init_state_impl)()

    def _init_state_impl(self) -> dict:
        return {
            "mod": [
                make_state(cfg, batch_shape=(len(idxs),))
                for idxs, cfg, (make_state, _), _, _ in self.groups
            ],
            "up": [
                interp.init_state(signs.shape[1], batch_shape=(len(idxs),))
                for idxs, _, _, signs, _ in self.groups
            ],
            "dev": interp.init_state(self.device.log2_interp, order=64),
        }

    def _step_impl(self, state: dict, afs: list[jnp.ndarray]):
        mod_states, up_states, merged, n_ch = [], [], None, 0
        for g, (idxs, cfg, (_, modulate), signs, residuals) in enumerate(
            self.groups
        ):
            af = jnp.stack([afs[i] for i in idxs])  # (C, block_af)
            mstate, iq = modulate(state["mod"][g], af, cfg,
                                  jnp.asarray(residuals))
            ustate, bb = interp.upchannelize_bank(state["up"][g], iq, signs)
            mod_states.append(mstate)
            up_states.append(ustate)
            contrib = bb.sum(axis=0)
            merged = contrib if merged is None else merged + contrib
            n_ch += len(idxs)
        if n_ch > 1:  # sum/÷k merge (dspdevicesinkengine work loop)
            merged = merged / n_ch
        dev_state, out = interp.interpolate_cascade(
            state["dev"], merged, self.device.log2_interp, order=64
        )
        i16 = jnp.stack(
            [
                jnp.clip(jnp.real(out) * 32768.0, -32768, 32767).astype(jnp.int16),
                jnp.clip(jnp.imag(out) * 32768.0, -32768, 32767).astype(jnp.int16),
            ],
            axis=-1,
        )
        return {"mod": mod_states, "up": up_states, "dev": dev_state}, i16

    def run(self, af_source, n_blocks: int):
        """af_source(block_idx, channel_idx, count) -> float32 AF block.
        Yields int16 (device_block, 2) arrays."""
        state = self.init_state()
        for b in range(n_blocks):
            afs = [
                jnp.asarray(af_source(b, c, self.block_af))
                for c in range(len(self.specs))
            ]
            state, out = self._step(state, afs)
            yield np.asarray(out)
        self.final_state = state
