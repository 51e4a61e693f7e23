"""Fused ÷2^k decimation as a Pallas TPU kernel (flat polyphase form).

The XLA path (dsp/decimators.py) runs one conv per ÷2 stage, writing every
intermediate rate to HBM (~23 bytes/input-sample of traffic for ÷64). This
kernel computes the *equivalent single-stage* filter of the whole cascade —
h_eq = h ∗ (h↑2) ∗ (h↑4) ∗ … (exact LTI composition) — decomposed into
2^k polyphase legs, so the kernel is 63 lane-shifted fused multiply-adds
over a (128-sublane × time-lane) tile and one sublane-reduction: layouts the
Mosaic compiler likes (minor-dim reshapes and strided lane slices are
unsupported — probed; see git history).

Data flow: XLA deinterleaves raw int16 (T,2) into (128, T/2^k) planes
[I/Q × 2^k legs on sublanes] — one cheap memory pass — then the kernel
DMAs overlapping tiles (+62-column halo), converts to f32, accumulates
Σ_t w[:,t]·v[:,m+t], and reduces I/Q groups. HBM traffic ≈ 12 B/sample
(int16 read + int16 planes write + kernel read) vs the XLA path's ~23.

Alignment: the streaming cascade (zero-prepended per stage) equals
y[M] = Σ_l h_eq[l]·x[2^k·M − D + l] with D = 62·(2^k − 1); padding h_eq
with (−D mod 2^k) leading zeros puts the kernel on the same output grid, so
this kernel matches dsp/decimators.py to ~1e-3 absolute (the f64→f32
rounding of the composed 3907-tap equivalent filter).

Status (round 2): the round-1 "~1 GS/s" measurement was an artifact of the
dispatch-poisoning bug (a closure-captured device array in the bench
harness serialized every call — see .claude/skills/verify/SKILL.md round-2
gotchas). Re-measured healthy (tools/bench_pallas.py, 2^23 blocks, real
chip): this VPU kernel at tile_out=256 runs 272-513 GS/s across passes,
the XLA flat conv 303-305, and the MXU variant below 240 — all inside the
tunnel's run-to-run noise band, i.e. the decimator is input-bandwidth
bound in every formulation and none is a chain bottleneck (the full
bench chain including it runs at 84-340 GS/s). The VMEM live-range cap is
real (tile_out 2048 OOMs at 56 MB scoped) but harmless at tile 256. The
XLA conv path stays the production default: same speed, carries the
streaming state, and covers inf/sup placements. decimate_cascade_fused_mxu
keeps the MXU form (per-tap sublane-contracting dots) for documentation
and as the base for any future fusion of downstream stages into the
kernel, where Pallas could win by keeping the baseband in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.hbfilter import hb_taps

#: input-rate halo covering the ÷64 cascade history (62·63 = 3906) rounded
#: so the per-tile DMA slice width (tile_out + HALO/2^k columns) stays
#: 128-lane aligned — Mosaic requires memref slices on tiling boundaries
HALO = 8192


@functools.lru_cache(maxsize=8)
def _equivalent_filter(log2_decim: int) -> np.ndarray:
    h = hb_taps(64).astype(np.float64)
    h_eq = np.array([1.0])
    for s in range(log2_decim):
        up = np.zeros(((len(h) - 1) << s) + 1)
        up[:: 1 << s] = h
        h_eq = np.convolve(h_eq, up)
    return h_eq


@functools.lru_cache(maxsize=8)
def _legs(log2_decim: int) -> np.ndarray:
    """(2^k, t_per_leg) float32 with the grid-alignment front padding."""
    r = 1 << log2_decim
    h_eq = _equivalent_filter(log2_decim)
    d = 62 * (r - 1)  # cascade group history
    front = (-d) % r  # zeros to land on the streaming output grid
    padded = np.concatenate([np.zeros(front), h_eq])
    t_per_leg = -(-len(padded) // r)
    full = np.zeros(t_per_leg * r)
    full[: len(padded)] = padded
    return full.reshape(t_per_leg, r).T.astype(np.float32)


def deinterleave_planes(raw: jnp.ndarray, log2_decim: int) -> jnp.ndarray:
    """raw (T', 2) int16 -> (2*2^k, T'/2^k) int16 planes: row c is
    [I legs | Q legs]; plane[q*2^k + p, i] = raw[2^k*i + p, q]."""
    r = 1 << log2_decim
    t = raw.shape[0]
    v = raw.reshape(t // r, r, 2)
    return v.transpose(2, 1, 0).reshape(2 * r, t // r)


@functools.partial(jax.jit, static_argnames=("log2_decim", "tile_out", "interpret"))
def decimate_cascade_fused(
    raw: jnp.ndarray,
    log2_decim: int = 6,
    tile_out: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """raw: (T + HALO, 2) int16 — a block preceded by the previous block's
    last HALO raw samples (zeros for the first block). Returns (2, T/2^k)
    float32 I/Q planes (complex assembly left to callers so device→host
    transfers stay real-valued).
    """
    r = 1 << log2_decim
    t_ext = raw.shape[0]
    t = t_ext - HALO
    assert t % (tile_out * r) == 0, (t, tile_out, r)
    n_tiles = t // (tile_out * r)
    legs = _legs(log2_decim)  # (r, t_leg)
    t_leg = legs.shape[1]
    halo_cols = HALO // r  # history columns per tile (>= t_leg - 1)
    assert halo_cols >= t_leg - 1, (halo_cols, t_leg)

    planes = deinterleave_planes(raw, log2_decim)  # (2r, T'/r) int16
    w = jnp.asarray(np.concatenate([legs, legs], axis=0))  # (2r, t_leg)

    def kernel(planes_hbm, w_ref, out_ref):
        i = pl.program_id(0)

        def body(scratch, vf32, acc_ref, sem):
            dma = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(i * tile_out, tile_out + halo_cols)],
                scratch,
                sem,
            )
            dma.start()
            dma.wait()
            # f32 conversion staged through a ref so the shifted reads below
            # don't force the whole unrolled chain to stay live (VMEM OOM)
            vf32[:] = scratch[:].astype(jnp.float32) * (1.0 / 32768.0)
            acc_ref[:] = jnp.zeros((2 * r, tile_out), jnp.float32)
            # columns [halo_cols - (t_leg-1) ..] hold the aligned history so
            # the kept outputs are the tile's own
            base = halo_cols - (t_leg - 1)
            for tt in range(t_leg):
                wcol = w_ref[:, tt : tt + 1]  # (2r, 1)
                acc_ref[:] = acc_ref[:] + wcol * vf32[:, base + tt : base + tt + tile_out]
            out_ref[:] = acc_ref[:].reshape(2, r, tile_out).sum(axis=1)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2 * r, tile_out + halo_cols), jnp.int16),
            vf32=pltpu.VMEM((2 * r, tile_out + halo_cols), jnp.float32),
            acc_ref=pltpu.VMEM((2 * r, tile_out), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, t // r), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, tile_out), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(planes, w)


@functools.partial(jax.jit, static_argnames=("log2_decim", "tile_out", "interpret"))
def decimate_cascade_fused_mxu(
    raw: jnp.ndarray,
    log2_decim: int = 6,
    tile_out: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """MXU formulation of the fused decimator (the round-2 direction from
    the VPU kernel's status note): per tap t the contribution of all 128
    [I|Q]×leg sublanes to the (2, M) output tile is ONE matmul
    W_t(2,128) @ v[:, t:t+M](128, M) contracting the sublane dim — so the
    inner loop is t_leg MXU dots instead of t_leg broadcast-FMAs, and the
    shifted windows never materialize as separate live values (each dot
    consumes its window immediately). This lifts the VMEM live-range cap
    that held the VPU form at tile_out≈256.

    Same I/O contract as decimate_cascade_fused.
    """
    r = 1 << log2_decim
    t_ext = raw.shape[0]
    t = t_ext - HALO
    assert t % (tile_out * r) == 0, (t, tile_out, r)
    n_tiles = t // (tile_out * r)
    legs = _legs(log2_decim)  # (r, t_leg)
    t_leg = legs.shape[1]
    halo_cols = HALO // r
    assert halo_cols >= t_leg - 1, (halo_cols, t_leg)

    planes = deinterleave_planes(raw, log2_decim)  # (2r, T'/r) int16

    # W stack: rows [2t, 2t+1] pick tap t's I and Q contributions out of
    # the 128 [I legs | Q legs] sublanes
    w_np = np.zeros((2 * t_leg, 2 * r), np.float32)
    for tt in range(t_leg):
        w_np[2 * tt, :r] = legs[:, tt]
        w_np[2 * tt + 1, r:] = legs[:, tt]

    def kernel(planes_hbm, w_ref, out_ref):
        i = pl.program_id(0)

        def body(scratch, vf32, sem):
            dma = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(i * tile_out, tile_out + halo_cols)],
                scratch,
                sem,
            )
            dma.start()
            dma.wait()
            vf32[:] = scratch[:].astype(jnp.float32) * (1.0 / 32768.0)
            base = halo_cols - (t_leg - 1)
            acc = jnp.zeros((2, tile_out), jnp.float32)
            for tt in range(t_leg):
                wt = w_ref[2 * tt : 2 * tt + 2, :]  # (2, 2r)
                win = vf32[:, base + tt : base + tt + tile_out]  # (2r, M)
                acc = acc + jax.lax.dot_general(
                    wt, win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[:] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2 * r, tile_out + halo_cols), jnp.int16),
            vf32=pltpu.VMEM((2 * r, tile_out + halo_cols), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, t // r), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, tile_out), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(planes, jnp.asarray(w_np))


def reference_equivalent(raw: np.ndarray, log2_decim: int = 6) -> np.ndarray:
    """Oracle: the streaming XLA cascade with the same halo convention."""
    from ..dsp import decimators as dec

    x = raw.astype(np.float32) / 32768.0
    state = jax.jit(lambda: dec.init_state(log2_decim))()

    @jax.jit
    def run(state, xf):
        # complex64 is assembled INSIDE jit and returned as flat floats, and
        # the cascade state enters as an argument rather than a closure:
        # some TPU runtimes implement no eager complex64 ops/transfers and
        # cannot fetch closure constants at trace time
        c = (xf[:, 0] + 1j * xf[:, 1]).astype(jnp.complex64)
        _, y = dec.decimate_cascade(state, c, log2_decim, "cen")
        return jnp.concatenate([jnp.real(y), jnp.imag(y)])

    y = np.asarray(run(state, jnp.asarray(x))).reshape(2, -1)
    return y[:, HALO >> log2_decim :]
