"""Polyphase rational resampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrangel_tpu.dsp import resampler
from sdrangel_tpu.dsp.types import np_tone


def test_plan_counts():
    # 156250 -> 48000: ratio 625/192
    plan = resampler.make_plan(156250.0, 48000.0, block_in=625 * 4)
    assert plan.block_out == 192 * 4
    # 96k -> 48k: ratio 2
    plan2 = resampler.make_plan(96000.0, 48000.0, block_in=4096)
    assert plan2.block_out == 2048


def test_tone_preserved():
    in_rate, out_rate = 156250.0, 48000.0
    plan = resampler.make_plan(in_rate, out_rate, block_in=625 * 8)
    f = 1000.0
    x = np_tone(f, in_rate, plan.block_in * 4)
    st = resampler.init_state(plan)
    outs = []
    run = jax.jit(resampler.resample_block, static_argnums=2)
    for b in range(4):
        st, y = run(st, jnp.asarray(x[b * plan.block_in : (b + 1) * plan.block_in]), plan)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)[plan.ntaps :]
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    f_est = np.mean(dphi) / (2 * np.pi) * out_rate
    assert abs(f_est - f) < 1.0
    np.testing.assert_allclose(np.abs(y), 0.5, rtol=0.02)


def test_out_of_band_rejected():
    in_rate, out_rate = 192000.0, 48000.0
    plan = resampler.make_plan(in_rate, out_rate, block_in=4096)
    x = np_tone(60000.0, in_rate, plan.block_in)  # beyond output Nyquist
    st = resampler.init_state(plan)
    _, y = resampler.resample_block(st, jnp.asarray(x), plan)
    assert np.abs(np.asarray(y))[plan.ntaps :].mean() < 0.02


def test_block_continuity():
    in_rate, out_rate = 125000.0, 48000.0  # ratio 125/48
    plan = resampler.make_plan(in_rate, out_rate, block_in=125 * 16)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(plan.block_in * 2) + 1j * rng.standard_normal(plan.block_in * 2)).astype(np.complex64)
    st = resampler.init_state(plan)
    st, y1 = resampler.resample_block(st, jnp.asarray(x[: plan.block_in]), plan)
    _, y2 = resampler.resample_block(st, jnp.asarray(x[plan.block_in :]), plan)
    y_split = np.concatenate([np.asarray(y1), np.asarray(y2)])

    plan2 = resampler.make_plan(in_rate, out_rate, block_in=plan.block_in * 2)
    st2 = resampler.init_state(plan2)
    _, y_full = resampler.resample_block(st2, jnp.asarray(x), plan2)
    np.testing.assert_allclose(y_split, np.asarray(y_full), atol=2e-5)
