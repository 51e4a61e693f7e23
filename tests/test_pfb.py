"""Polyphase DFT filter-bank channelizer (dsp/pfb.py): convolution-oracle
exactness, streaming seams, tone selectivity — the one-kernel uniform-grid
alternative to per-channel DownChannelizer trees (SURVEY §7.1,
downchannelizer.cpp:250-287)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrangel_tpu.dsp import pfb


def _noise(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


@pytest.mark.parametrize("m,p", [(8, 4), (16, 8), (64, 8)])
def test_pfb_matches_convolution_oracle(m, p):
    x = _noise(m * 48)
    h = pfb.prototype(m, p)
    st = pfb.make_state(m, p)
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m, h))(st, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (48, m)
    for c in (0, 1, m // 2, m - 1):
        o = pfb.oracle_channel(x, m, c, h)
        err = np.abs(y[:, c] - o).max() / max(np.abs(o).max(), 1e-9)
        assert err < 1e-5, (c, err)


def test_pfb_streaming_seam_exact():
    """Two half-blocks through carried state equal one full block."""
    m = 16
    x = _noise(m * 64, seed=2)
    run = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))
    st = pfb.make_state(m)
    _, y_full = run(st, jnp.asarray(x))
    st = pfb.make_state(m)
    st, y1 = run(st, jnp.asarray(x[: m * 32]))
    st, y2 = run(st, jnp.asarray(x[m * 32:]))
    y_split = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert np.abs(y_split - np.asarray(y_full)).max() < 1e-6


def test_pfb_tone_selectivity():
    """A tone at channel c's centre + δ lands in channel c at δ (baseband)
    with adjacent-channel leakage under -50 dB."""
    m = 32
    fs = 320_000.0
    c = 5
    delta = 900.0
    n = m * 512
    t = np.arange(n) / fs
    f0 = c * fs / m + delta
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    st = pfb.make_state(m)
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st, jnp.asarray(x))
    y = np.asarray(y)[64:]  # drop filter warmup
    power = (np.abs(y) ** 2).mean(axis=0)
    assert power.argmax() == c
    leak_db = 10 * np.log10(
        (power.sum() - power[c]) / power[c] + 1e-15)
    assert leak_db < -50, leak_db
    # the recovered baseband tone sits at δ (rate fs/M)
    seg = y[:, c]
    spec = np.abs(np.fft.fft(seg * np.hanning(len(seg)))) ** 2
    freqs = np.fft.fftfreq(len(seg), m / fs)
    assert abs(freqs[spec.argmax()] - delta) < fs / m / len(seg) * 2


def test_pfb_batched_shapes():
    m = 8
    x = np.stack([_noise(m * 16, s) for s in range(3)])
    st = pfb.make_state(m, batch_shape=(3,))
    st, y = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st, jnp.asarray(x))
    assert y.shape == (3, 16, m)
    # batch row 1 equals the unbatched run
    st1 = pfb.make_state(m)
    _, y1 = jax.jit(lambda s, xx: pfb.analyze(s, xx, m))(st1, jnp.asarray(x[1]))
    assert np.abs(np.asarray(y)[1] - np.asarray(y1)).max() < 1e-6


def test_pfb_channel_freqs():
    f = pfb.channel_freqs(8, 8000.0)
    assert list(f) == [0, 1000, 2000, 3000, 4000, -3000, -2000, -1000]


# ---------------------------------------------------------------------------
# Prototype spec vs the order-48 HB tree (VERDICT r2 #6)
# ---------------------------------------------------------------------------

def _tree_response(depth: int, nf: int = 1 << 14) -> tuple[np.ndarray, np.ndarray]:
    """Composite magnitude response of a depth-k centre chain of order-48
    half-band stages at the input rate."""
    from sdrangel_tpu.dsp.hbfilter import hb_taps

    h48 = hb_taps(48)
    n = np.arange(len(h48)) - (len(h48) - 1) / 2
    f = np.linspace(0, 0.5, nf)
    H = np.ones(nf, complex)
    for i in range(depth):
        w = 2 * np.pi * f * (1 << i)
        H *= (h48[None, :] * np.exp(-1j * np.outer(w, n))).sum(1)
    return f, np.abs(H)


def test_tree_reference_numbers_pinned():
    """The numbers the prototype spec is written against: order-48 HB tree
    composite response has <=0.05 dB passband ripple and -55.4 dB worst
    adjacent-band leakage at every depth."""
    for depth in (2, 3, 6):
        f, H = _tree_response(depth)
        half_out = 0.5 / (1 << depth)
        pb = H[f < 0.8 * half_out]
        adj = H[(f > 1.5 * half_out) & (f < 3.0 * half_out)]
        assert abs(20 * np.log10(pb.max())) < 0.05
        assert abs(20 * np.log10(max(pb.min(), 1e-12))) < 0.05
        adj_db = 20 * np.log10(adj.max() + 1e-12)
        assert -57.0 < adj_db < -54.0, (depth, adj_db)


@pytest.mark.parametrize("m", [16, 64])
def test_prototype_meets_tree_rejection(m):
    """The default prototype must be at least as selective as the tree it
    replaces: <=0.25 dB droop at +-0.35 fs/M, adjacent band <= -85 dB
    (tree: -55.4 dB) — flipping the PFB gear on never degrades filtering."""
    h = pfb.prototype(m)
    nf = 1 << 17
    Hf = np.abs(np.fft.rfft(h, 2 * nf))
    f = np.linspace(0, 0.5, nf + 1)
    ref = Hf[0]
    pb = Hf[f < 0.35 / m] / ref
    adj = Hf[(f > 0.75 / m) & (f < 1.5 / m)] / ref
    assert 20 * np.log10(pb.min()) > -0.25, 20 * np.log10(pb.min())
    assert 20 * np.log10(adj.max()) < -85.0, 20 * np.log10(adj.max())


@pytest.mark.slow
def test_pfb_gear_matches_tree_gear_demod_snr():
    """Same multi-tone FM scene demodulated through the PFB gear and the
    HB-tree gear: the PFB's audio SNR must not be worse (VERDICT r2 #6).
    Scene: FM carrier on a uniform-grid channel + strong adjacent-channel
    FM interferer."""
    import jax

    from sdrangel_tpu.dsp import channelizer as chanmod
    from sdrangel_tpu.channels import demod_nfm

    bb_rate = 384_000.0
    m = 8
    grid = bb_rate / m  # 48 kHz channels
    want = 1  # grid channel +48 kHz
    n = 6 * 49152
    t = np.arange(n)
    # wanted: FM tone 1 kHz, dev 3 kHz at +48k; interferer: FM at +96k, 3x
    ph_w = np.cumsum(2 * np.pi * (grid + 3000.0 * np.cos(2 * np.pi * 1000.0 * t / bb_rate)) / bb_rate)
    ph_i = np.cumsum(2 * np.pi * (2 * grid + 3000.0 * np.sin(2 * np.pi * 700.0 * t / bb_rate)) / bb_rate)
    x = (0.3 * np.exp(1j * ph_w) + 0.9 * np.exp(1j * ph_i)).astype(np.complex64)

    block = 49152
    cfg = demod_nfm.NFMConfig(
        channel_rate=grid, audio_rate=48000.0, fm_deviation=3000.0,
        squelch_db=-90.0, squelch_gate_ms=1.0, block_in=block // m)

    def snr_of(audio):
        a = audio[len(audio) // 3:]
        a = a - a.mean()
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
        freqs = np.fft.rfftfreq(len(a), 1.0 / 48000.0)
        tone = np.abs(freqs - 1000.0) < 8 * 48000.0 / len(a)
        return 10 * np.log10(spec[tone].sum() / spec[~tone & (freqs > 100)].sum())

    # PFB gear
    def pfb_step(cst, dst, xx):
        cst, y = pfb.analyze(cst, xx, m)
        dst, audio = demod_nfm.process(dst, y[..., want], cfg)
        return cst, dst, audio
    jstep = jax.jit(pfb_step)
    cst = jax.jit(lambda: pfb.make_state(m))()
    dst = jax.jit(lambda: demod_nfm.make_state(cfg))()
    outs = []
    for b in range(n // block):
        cst, dst, audio = jstep(cst, dst, jnp.asarray(x[b * block:(b + 1) * block]))
        outs.append(np.asarray(audio))
    snr_pfb = snr_of(np.concatenate(outs))

    # tree gear: plan to the same channel
    plan = chanmod.plan_channel(bb_rate, 48000.0, grid)
    assert plan.channel_rate == grid
    cfg_t = demod_nfm.NFMConfig(
        channel_rate=grid, input_offset=plan.residual_offset,
        audio_rate=48000.0, fm_deviation=3000.0,
        squelch_db=-90.0, squelch_gate_ms=1.0, block_in=block >> len(plan.signs))

    def tree_step(cst, dst, xx):
        cst, y = chanmod.channelize(cst, xx, plan)
        dst, audio = demod_nfm.process(dst, y, cfg_t)
        return cst, dst, audio
    jstep_t = jax.jit(tree_step)
    cst_t = jax.jit(lambda: chanmod.init_state(len(plan.signs)))()
    dst_t = jax.jit(lambda: demod_nfm.make_state(cfg_t))()
    outs = []
    for b in range(n // block):
        cst_t, dst_t, audio = jstep_t(cst_t, dst_t, jnp.asarray(x[b * block:(b + 1) * block]))
        outs.append(np.asarray(audio))
    snr_tree = snr_of(np.concatenate(outs))

    assert snr_pfb > 25.0, f"pfb snr {snr_pfb:.1f}"
    assert snr_pfb >= snr_tree - 1.0, (
        f"PFB gear ({snr_pfb:.1f} dB) worse than tree gear ({snr_tree:.1f} dB)")


def test_analyze_select_matches_full_analysis():
    """analyze_select == analyze restricted to the selected channels
    (the chain64 flagship uses the select path's math via plain FFT+take;
    the partial-DFT variant must stay exact)."""
    m = 32
    x = _noise(m * 40, seed=9)
    sel = np.array([0, 5, 31, 16, 250 % m])
    _, yfull = pfb.analyze(pfb.make_state(m), x, m)
    _, ysel = pfb.analyze_select(pfb.make_state(m), x, m, sel)
    np.testing.assert_allclose(
        np.asarray(ysel), np.asarray(yfull)[..., sel], atol=2e-4)
