"""DSD front-end test: synthesize 4FSK, recover the dibit stream."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.channels import demod_dsd


@pytest.mark.slow
def test_4fsk_dibit_recovery():
    cfg = demod_dsd.DSDConfig(channel_rate=48000.0, squelch_db=-90.0)
    sps = cfg.sps
    rng = np.random.default_rng(3)
    n_sym = 4096
    # DSDcc level convention: dibit -> level
    lev_of = {1: 3.0, 0: 1.0, 2: -1.0, 3: -3.0}
    dibits = rng.integers(0, 4, n_sym)
    levels = np.array([lev_of[int(d)] for d in dibits])
    # frequency levels: ±1/3, ±1 of deviation
    inst_f = np.repeat(levels / 3.0, sps) * cfg.fm_deviation
    phase = 2 * np.pi * np.cumsum(inst_f) / 48000.0
    x = (0.5 * np.exp(1j * phase)).astype(np.complex64)

    st = demod_dsd.make_state(cfg)
    block = cfg.resampler_plan.block_in
    got, soft = [], []
    for b in range(len(x) // block):
        st, outs = demod_dsd.process(st, jnp.asarray(x[b * block : (b + 1) * block]), cfg)
        got.append(np.asarray(outs.dibits))
        soft.append(np.asarray(outs.soft_symbols))
    got = np.concatenate(got)
    # constant alignment offset (carry/filter delays); find the best lag
    tx = dibits
    best = 0.0
    for off in range(-80, 17):  # squelch delay line shifts ~48 symbols
        sel = [(i, i + off) for i in range(len(got) // 2, len(got)) if 0 <= i + off < len(tx)]
        if not sel:
            continue
        acc = sum(int(got[i] == tx[j]) for i, j in sel) / len(sel)
        best = max(best, acc)
    assert best > 0.9, f"dibit accuracy {best:.2f}"
