"""DVB-S FEC chain tests: each layer + full loopback with channel errors."""

import numpy as np
import pytest

from sdrangel_tpu.channels import dvbs


def _ts_packets(n, seed=0):
    rng = np.random.default_rng(seed)
    pk = rng.integers(0, 256, size=(n, dvbs.TS_PACKET), dtype=np.uint8)
    pk[:, 0] = dvbs.SYNC_BYTE
    return pk.reshape(-1)


def test_conv_viterbi_clean():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 600).astype(np.uint8)
    coded = dvbs.conv_encode(bits)
    decoded = dvbs.viterbi_decode(coded)
    np.testing.assert_array_equal(decoded, bits)


def test_viterbi_corrects_channel_errors():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    coded = dvbs.conv_encode(bits).astype(np.float64) * 2 - 1
    noisy = coded + 0.6 * rng.standard_normal(len(coded))
    decoded = dvbs.viterbi_decode(noisy)
    ber = (decoded != bits).mean()
    assert ber < 0.01, ber


def test_interleaver_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 204 * 30, dtype=np.uint8)
    rt = dvbs.deinterleave(dvbs.interleave(data))
    d = dvbs.INTERLEAVER_DELAY
    np.testing.assert_array_equal(rt[d:], data[: len(data) - d])


def test_rs_roundtrip_and_correction():
    rng = np.random.default_rng(4)
    msg = rng.integers(0, 256, dvbs.TS_PACKET, dtype=np.uint8)
    cw = dvbs.rs_encode(msg)
    out, n = dvbs.rs_decode(cw)
    assert n == 0
    np.testing.assert_array_equal(out, msg)
    # up to 8 byte errors correct
    bad = cw.copy()
    pos = rng.choice(204, 8, replace=False)
    bad[pos] ^= rng.integers(1, 256, 8).astype(np.uint8)
    out, n = dvbs.rs_decode(bad)
    assert n == 8
    np.testing.assert_array_equal(out, msg)
    # 9 errors -> flagged uncorrectable
    bad9 = cw.copy()
    pos = rng.choice(204, 9, replace=False)
    bad9[pos] ^= rng.integers(1, 256, 9).astype(np.uint8)
    _, n = dvbs.rs_decode(bad9)
    assert n == -1


def test_scramble_involution():
    pk = _ts_packets(8, seed=5)
    rt = dvbs.fix_sync(dvbs.descramble(dvbs.scramble(pk)))
    np.testing.assert_array_equal(rt, pk)


def test_full_transport_loopback_with_errors():
    n_pk = 16
    pk = _ts_packets(n_pk, seed=6)
    chan = dvbs.encode_transport(pk).astype(np.float64) * 2 - 1
    rng = np.random.default_rng(7)
    # flip ~0.5% of channel bits (pre-Viterbi)
    flips = rng.random(len(chan)) < 0.005
    chan[flips] *= -1
    # interleaver pipeline eats 11 packets: send 11 extra tail packets
    pad = _ts_packets(11, seed=8)
    chan_full = dvbs.encode_transport(np.concatenate([pk, pad])).astype(np.float64) * 2 - 1
    flips = rng.random(len(chan_full)) < 0.005
    chan_full[flips] *= -1
    out, corrected = dvbs.decode_transport(chan_full, n_pk)
    out = out.reshape(-1, dvbs.TS_PACKET)[:n_pk]
    np.testing.assert_array_equal(out.reshape(-1), pk)


@pytest.mark.parametrize("rate", ["2/3", "3/4", "5/6", "7/8"])
def test_punctured_viterbi(rate):
    rng = np.random.default_rng(10)
    bits = rng.integers(0, 2, 840).astype(np.uint8)
    coded = dvbs.conv_encode(bits)
    punct = dvbs.puncture(coded, rate).astype(np.float64) * 2 - 1
    soft = dvbs.depuncture(punct, rate)
    decoded = dvbs.viterbi_decode(soft)
    n = min(len(decoded), len(bits)) - 8  # tail truncation from puncture period
    assert (decoded[:n] == bits[:n]).mean() > 0.999


@pytest.mark.slow
def test_recover_ts_rates_and_rotations():
    """recover_ts resolves the joint (QPSK rotation x puncture phase x bit
    alignment) ambiguity at every DVB-S FEC rate — verified by RS, because
    sync counting alone aliases (the conv code is transparent to 180°
    rotation, and punctured streams admit false sync-rich rotations)."""
    from sdrangel_tpu.channels import demod_datv

    rng = np.random.default_rng(0)
    pk = rng.integers(0, 256, size=(40, dvbs.TS_PACKET), dtype=np.uint8)
    pk[:, 0] = dvbs.SYNC_BYTE
    for rate in ("1/2", "2/3", "7/8"):
        chan = dvbs.encode_transport(pk.reshape(-1))
        if rate != "1/2":
            chan = dvbs.puncture(chan, rate)
        sym = demod_datv.bits_to_qpsk(chan)
        for r in (1j, -1):  # the two ambiguities that used to alias
            s = sym * r
            ts, stats = demod_datv.recover_ts(
                np.real(s).astype(np.float32), np.imag(s).astype(np.float32),
                fec_rate=rate)
            got = np.frombuffer(ts, np.uint8).reshape(-1, dvbs.TS_PACKET)
            assert stats["rsFailed"] == 0, (rate, r, stats)
            match = sum(
                any(np.array_equal(g[1:], pk[j, 1:]) for j in range(len(pk)))
                for g in got
            )
            assert match == len(got) > 10, (rate, r, match, len(got))


def test_energy_dispersal_spec_vectors():
    """EN 300 421 §4.4: PRBS (1+x^14+x^15, init 100101010000000) output
    starts 0x03 0xF6 ... and the FIRST PRBS byte applies to the first byte
    AFTER the inverted sync; sync positions are gated (PRBS keeps running,
    output disabled)."""
    from sdrangel_tpu.channels.dvbs import (
        _PRBS_XOR, _prbs_bytes, TS_PACKET, scramble)

    seq = _prbs_bytes(4)
    assert list(seq) == [0x03, 0xF6, 0x08, 0x34]
    assert _PRBS_XOR[0] == 0 and _PRBS_XOR[1] == 0x03
    assert all(_PRBS_XOR[k * TS_PACKET] == 0 for k in range(8))
    # gating consumes the PRBS byte: offset 189 gets seq[188], not seq[187]
    assert _PRBS_XOR[TS_PACKET + 1] == _prbs_bytes(TS_PACKET + 1)[TS_PACKET]

    pk = np.zeros(8 * TS_PACKET, np.uint8)
    pk[::TS_PACKET] = 0x47
    out = scramble(pk)
    assert out[0] == 0xB8               # inverted first sync
    assert out[1] == 0x03               # first data byte ^ PRBS[0]
    assert all(out[k * TS_PACKET] == 0x47 for k in range(1, 8))
