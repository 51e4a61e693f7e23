"""Mesh-sharded pipeline: time-sharded decimation with halo exchange +
channel-sharded demod bank.

This is the TPU-native replacement for the reference's two concurrency axes
(SURVEY.md §2.6): per-channel threads (threadedbasebandsamplesink.h) become
the mesh "channel" axis; the unbounded sample stream (filter-state streaming,
SURVEY §5 long-context analog) is sharded over the mesh "time" axis with the
filter-history overlap exchanged between neighbor shards via lax.ppermute —
structurally ring-attention's halo exchange.

Streaming correctness across blocks: the ppermute ring hands each shard the
tail of its left neighbor; the wrap-around tail received by shard 0 is the
block's global tail, which the host feeds back as the carry for the next
block, so the seam between blocks is exact (verified in
tests/test_sharding.py against the single-device pipeline).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..channels import demod_nfm
from ..dsp import channelizer as chan
from ..dsp import decimators as dec
from ..dsp.hbfilter import DECIMATORS_ORDER


def make_mesh(n_time: int, n_channel: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_time * n_channel, (
        f"need {n_time * n_channel} devices, have {devices.size}"
    )
    grid = devices[: n_time * n_channel].reshape(n_time, n_channel)
    return Mesh(grid, ("time", "channel"))


def halo_samples(log2_decim: int, order: int = DECIMATORS_ORDER) -> int:
    """Input-rate halo H covering the whole cascade's filter history:
    the exact need is (L-1)(2^k - 1) with L = order-1 taps; rounded up to a
    multiple of 4·2^k so rotation patterns and stage strides stay aligned."""
    if log2_decim == 0:
        return 0
    l_taps = order - 1
    need = (l_taps - 1) * ((1 << log2_decim) - 1)
    align = 4 << log2_decim
    return ((need + align - 1) // align + 1) * align


def _cascade_with_halo(x_ext: jnp.ndarray, log2: int, fc_pos: str, halo: int) -> jnp.ndarray:
    """Zero-state cascade over [halo | local]; drops the halo-driven head so
    the remaining outputs equal the streaming cascade's. Uses the flat
    composed-filter form (one HBM pass — the same kernel the single-chip
    engine defaults to); valid because every output at index ≥ halo/2^k
    reads only real samples (the flat history r·(t_leg−1) ≤ halo)."""
    state = dec.init_flat_state(log2, batch_shape=x_ext.shape[:-1])
    assert state.tail.shape[-1] <= halo, (state.tail.shape, halo)
    _, y = dec.decimate_flat_any(state, x_ext, log2, fc_pos)
    return y[..., halo >> log2 :]


@dataclasses.dataclass(frozen=True, eq=False)
class ShardedPipelineConfig:
    """Time×channel sharded NFM bank — the flagship multi-chip configuration
    ("64-channel sharded channelizer bank", BASELINE.json configs[4])."""

    n_time: int
    n_channel: int
    device_rate: float = 12_288_000.0  # /64 -> 192 kHz baseband (integer ratio to 48k audio)
    log2_decim: int = 6
    fc_pos: str = "cen"
    n_channels: int = 64  # total demod channels (multiple of n_channel)
    chan_stages: int = 0  # extra per-channel ÷2 stages after device cascade
    block: int = 1 << 20  # device-rate samples per step (global)

    @property
    def baseband_rate(self) -> float:
        return self.device_rate / (1 << self.log2_decim)

    @functools.cached_property
    def demod_cfg(self) -> demod_nfm.NFMConfig:
        return demod_nfm.NFMConfig(
            channel_rate=self.baseband_rate / (1 << self.chan_stages),
            input_offset=0.0,
            block_in=(self.block >> self.log2_decim) >> self.chan_stages,
            squelch_db=-100.0,  # bench config: squelch open
            squelch_gate_ms=1.0,  # minimal attack so short runs produce audio
        )


def build_sharded_step(cfg: ShardedPipelineConfig, mesh: Mesh):
    """Returns (step, init_fn). step(state, x, carry, offsets) -> (state',
    audio (C, A) f32, new_carry); everything is shard_map'ed over the mesh.

    x: (T,) int16×2 — sharded over 'time'. offsets: (C,) f32 per-channel
    frequency offsets — sharded over 'channel'. carry: (H,) complex as 2×f32
    — the previous block's tail for shard 0's halo.
    """
    halo = halo_samples(cfg.log2_decim)
    n_time = cfg.n_time
    c_local = cfg.n_channels // cfg.n_channel
    demod_cfg = cfg.demod_cfg

    def local_step(state, x_local, carry, offsets_local):
        # x_local: (T/n_time, 2) int16; carry: (2, H) f32; offsets: (C/nc,)
        xc = (x_local.astype(jnp.float32) / 32768.0)
        xc = (xc[..., 0] + 1j * xc[..., 1]).astype(jnp.complex64)

        if halo:
            tail = xc[-halo:]
            perm = [(i, (i + 1) % n_time) for i in range(n_time)]
            recv = jax.lax.ppermute(tail, "time", perm)
            # shard 0's ring wrap-around is replaced by the host-fed carry;
            # what it received is the global tail = next block's carry.
            t_idx = jax.lax.axis_index("time")
            carry_c = (carry[0] + 1j * carry[1]).astype(jnp.complex64)
            left = jnp.where(t_idx == 0, carry_c, recv)
            new_carry_c = jax.lax.psum(
                jnp.where(t_idx == 0, recv, jnp.zeros_like(recv)), "time"
            )
            ext = jnp.concatenate([left, xc])
            bb_local = _cascade_with_halo(ext, cfg.log2_decim, cfg.fc_pos, halo)
            new_carry = jnp.stack([jnp.real(new_carry_c), jnp.imag(new_carry_c)])
        else:
            bb_local = xc
            new_carry = carry

        # axis swap: gather full baseband time series (small after ÷2^k)
        bb = jax.lax.all_gather(bb_local, "time", tiled=True)  # (T/2^k,)

        # local channel subset: broadcast baseband per channel, demod bank
        xb = jnp.broadcast_to(bb, (c_local, bb.shape[-1]))
        if cfg.chan_stages:
            cstate = chan.init_state(cfg.chan_stages, batch_shape=(c_local,))
            signs = np.zeros((c_local, cfg.chan_stages), int)
            _, xb = chan.channelize_bank(cstate, xb, signs)
        dstate, audio = demod_nfm.process(state, xb, demod_cfg, offset_hz=offsets_local)
        return dstate, audio, new_carry

    state_specs = jax.tree.map(lambda _: P("channel"), _state_structure(cfg))
    step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_specs, P("time"), P(), P("channel")),
            out_specs=(state_specs, P("channel"), P()),
            # outputs ARE replicated over 'time' (they derive from the
            # all_gathered baseband); the VMA inference can't prove it.
            check_vma=False,
        )
    )

    def init_fn():
        def impl():
            state = demod_nfm.make_state(demod_cfg, batch_shape=(cfg.n_channels,))
            carry = jnp.zeros((2, max(halo, 1)), dtype=jnp.float32)
            return state, carry
        return jax.jit(impl)()  # eager complex creation unsupported on some runtimes

    return step, init_fn


def _state_structure(cfg: ShardedPipelineConfig):
    return demod_nfm.make_state(cfg.demod_cfg, batch_shape=(cfg.n_channels,))
